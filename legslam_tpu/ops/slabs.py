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
can therefore run on a static row-prefix covering the watermark — EXACT by
the invariants above, saving the tail fraction of HBM traffic + VPU time.

Implementation: lax.switch over n_slabs quantized prefix lengths (branch k
computes rows [0, slab*(k+1)) and fills the tail from `tail_fn`) — the same
pattern as the backward scatter's slab-skip
(ops/pallas/composite.py:_take_pairs_bwd). A lax.map/lax.cond loop form
(one executable regardless of slab count) was tried first and measured FAR
worse in-step on v5e (step_cached 61.3 -> 92.8 ms at 640x480/16 slabs: the
scan serializes against neighboring segments and each of the ~64 loop
iterations pays fixed overhead); switch branches are straight-line code
XLA fuses like the unskipped graph, at the cost of n_slabs compiled branch
bodies — keep n_slabs modest (8).

Under vmap/shard_map batching lax.switch stays a real branch only when the
selector is unbatched; otherwise it degrades to computing all branches —
the single-view hot path is the one that matters, multi-view paths keep
p_slabs off.

MEASURED RESULT (v5e, 2026-08-19): the switch form is ALSO a regression
in-step — scannet bench 16.40 -> 12.34 it/s at p_slabs=8 (640x480, 200k
live / 262k capacity). The switch boundary stops XLA fusing the
per-gaussian segments with their neighbors and the head/tail concats
re-materialize full [P,...] buffers; at 76% occupancy the covering
prefix is 7/8 slabs, so only ~12% of tail traffic is skipped. Defaults
are p_slabs=0 everywhere; the knob is kept for re-measurement at lower
occupancy (a freshly-grown store) where the arithmetic could flip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def watermark(valid: jnp.ndarray) -> jnp.ndarray:
    """Smallest prefix length covering every True row of `valid` [P]."""
    P = valid.shape[0]
    iota1 = jnp.arange(1, P + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(valid, iota1, 0))


def prefix_map(fn, tail_fn, args, hi: jnp.ndarray, n_slabs: int):
    """Apply rowwise `fn` over the static row-prefix covering `hi`.

    args: pytree of arrays sharing a leading axis P (P % n_slabs == 0).
    fn(prefix_args) -> pytree of [m, ...] outputs for the covering prefix
    m = slab*ceil(hi/slab); tail_fn(tail_args) -> same structure for the
    remaining [P - m, ...] rows (constants for pad-style outputs, or the
    sliced inputs themselves for update-in-place semantics). Outputs are
    concatenated back to [P, ...].

    Exactness contract: callers must guarantee rows >= hi are don't-care
    (render path: mask/radius-gated downstream) or fixed points of fn
    (adam/stats on zero-moment zero-grad rows).
    """
    leaves = jax.tree.leaves(args)
    P = leaves[0].shape[0]
    assert P % n_slabs == 0, (P, n_slabs)
    slab = P // n_slabs

    def make(k):
        m = slab * (k + 1)

        def branch(a):
            out_head = fn(jax.tree.map(lambda x: x[:m], a))
            if m == P:
                return out_head
            out_tail = tail_fn(jax.tree.map(lambda x: x[m:], a))
            return jax.tree.map(
                lambda h, t: jnp.concatenate([h, t], axis=0),
                out_head, out_tail)
        return branch

    sel = jnp.clip((hi + slab - 1) // slab - 1, 0, n_slabs - 1)
    return jax.lax.switch(sel.astype(jnp.int32),
                          [make(k) for k in range(n_slabs)], args)
