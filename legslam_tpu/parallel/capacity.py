"""Multi-chip training: capacity-axis (FSDP-style) sharding of the store.

The third TPU-native scaling axis. parallel/sharded.py batches VIEWS and
parallel/spatial.py shards one view's PIXELS, but both replicate the
Gaussian store — multi-chip buys throughput, never map capacity. Here the
persistent store state (the 7 parameter groups, their Adam moments, the
densify stats, valid/exist_since — everything with a capacity-leading
axis) lives sharded over the mesh: each device owns capacity / D rows.
A mapping step follows the FSDP recipe from the scaling playbook:

  gather:  inside the loss, the parameter shards pass through a
           replicated sharding constraint — XLA inserts the all-gather
           over ICI, producing the transient full-store working set the
           renderer needs;
  compute: the render itself is strip-sharded (parallel/spatial.py), so
           the SAME mesh axis that divides the store also divides the
           pixels — device i holds 1/D of the map and renders 1/D of the
           image;
  scatter: the transpose of that sharding constraint turns the gradient
           cotangents back toward the owner shards, and the elementwise
           Adam update + densify-stat accumulation run sharded (XLA
           partitions them to match the sharded outputs).

Persistent memory per device drops ~1/D (params + two Adam moments +
stats dominate at bench capacities); the transient gathered working set
exists only inside the step. The reference has no equivalent — it is
strictly single-GPU (SURVEY.md §2 end); this is the TPU-native answer to
maps larger than one chip's HBM.

Exactness: the sharding constraint is semantically the identity, so the
step computes bit-for-bit what parallel/spatial.spatial_train_step
computes on a replicated store (asserted in tests/test_capacity.py).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legslam_tpu.models import gaussians as G


def capacity_axes(mesh: Mesh) -> tuple[str, ...]:
    """Every mesh axis, so the store rows shard over the full device set
    (works for the 1D ('data',) mesh and the 2D ('data', 'strip') one)."""
    return tuple(mesh.axis_names)


def shard_state(state: G.GaussianState, mesh: Mesh) -> G.GaussianState:
    """Place the store with every capacity-leading leaf sharded on its
    row axis over ALL mesh axes; scalars replicate. Re-placing an
    already-sharded state is a no-op (device_put with an unchanged
    sharding does not copy)."""
    cap = state.capacity
    row = NamedSharding(mesh, P(capacity_axes(mesh)))
    rep = NamedSharding(mesh, P())

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cap:
            return jax.device_put(x, row)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)


def shard_bytes_per_device(state: G.GaussianState) -> int:
    """Persistent store bytes held by device 0 (diagnostic; tests assert
    the ~1/D scaling)."""
    total = 0
    for leaf in jax.tree.leaves(state):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            total += shards[0].data.size * leaf.dtype.itemsize
    return total
