"""Watermark slab-skip for P-bound (capacity-padded) per-gaussian ops.

The gaussian store is capacity-padded (e.g. 262144 slots holding 200k live
gaussians) and every per-gaussian segment of the training step — preprocess
+ its VJP, SH eval, Adam, densify stats — runs over ALL slots
(trainForOneIteration's per-point work in the reference sizes its launches
to the LIVE count, src/gaussian_mapper.cpp:624-798 / forward.cu:156, so the
padding tax is TPU-specific). Live slots are allocated lowest-free-first
(models/gaussians.py:_allocate_slots), so live rows always sit below a
watermark; rows at/above it are invalid with ZERO Adam moments (zeroed on
prune surgery and on fresh allocation) and zero incoming grads. These ops
can therefore run slab-by-slab under lax.map, skipping (lax.cond) slabs
entirely above the watermark — EXACT by the invariants above, saving the
tail fraction of HBM traffic + VPU time on every P-bound segment.

The lax.map/cond structure (vs the backward scatter's lax.switch slab-skip,
ops/pallas/composite.py:_take_pairs_bwd) keeps ONE executable regardless of
slab count, so the quantization can be fine (16 slabs default via
RasterizeConfig.p_slabs) without multiplying remote-compile time.

Under vmap/shard_map batching, lax.cond degrades to a select (both branches
execute) — still correct, just no skip; the single-view hot path is the
one that matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def watermark(valid: jnp.ndarray) -> jnp.ndarray:
    """Smallest prefix length covering every True row of `valid` [P]."""
    P = valid.shape[0]
    iota1 = jnp.arange(1, P + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(valid, iota1, 0))


def prefix_map(fn, skip_fn, args, hi: jnp.ndarray, n_slabs: int):
    """Apply rowwise `fn` over the row-prefix covering `hi`, slab-by-slab.

    args: pytree of arrays sharing a leading axis P (P % n_slabs == 0).
    fn(slab_args) -> pytree of [slab, ...] outputs; runs for slabs whose
    base row is < hi. skip_fn(slab_args) -> same structure; runs for slabs
    entirely at/above hi (constants for pad-style outputs, or the inputs
    themselves for update-in-place semantics).

    Exactness contract: callers must guarantee rows >= hi are don't-care
    (render path: mask/radius-gated downstream) or fixed points of fn
    (adam/stats on zero-moment zero-grad rows).
    """
    leaves = jax.tree.leaves(args)
    P = leaves[0].shape[0]
    assert P % n_slabs == 0, (P, n_slabs)
    slab = P // n_slabs
    sl = jax.tree.map(
        lambda a: a.reshape((n_slabs, slab) + a.shape[1:]), args)
    bases = jnp.arange(n_slabs, dtype=jnp.int32) * slab

    def one(xs):
        base, a = xs
        return jax.lax.cond(base < hi, fn, skip_fn, a)

    out = jax.lax.map(one, (bases, sl))
    return jax.tree.map(
        lambda o: o.reshape((P,) + o.shape[2:]), out)
