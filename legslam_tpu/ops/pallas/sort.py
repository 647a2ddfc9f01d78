"""Pallas TPU bitonic sort: the CUB-radix-sort replacement for binning.

The reference sorts 64-bit [tile|depth] keys with CUB device radix sort
(cuda_rasterizer/rasterizer_impl.cu:301-309). XLA's lax.sort on this TPU
stack costs ~100ms for 2M keys — far off the ~1ms GPU budget — so binning
gets its own kernel: a fully VMEM-resident bitonic network.

Layout trick: keys live as [R, 128] in LANE-MAJOR linear order
(n = lane * R + row). Bitonic compare-exchange partners are n XOR s:
  * strides s < R act on the row (sublane) axis,
  * strides s >= R act on the lane axis (only the last log2(128) = 7
    strides of the largest merge blocks),
both implemented uniformly as a cyclic roll (the XOR pairing selects the
correct half of each rolled pair, so the wrap-around lanes are never
chosen). Every stage is ~6 VPU ops/element; the whole network is
O(N log^2 N) with zero HBM traffic between stages.

Key-only and (key, value) variants; float keys sort via their int32 bit
pattern (monotone for non-negative floats, which covers view depths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
INT32_MAX = np.int32(2 ** 31 - 1)


def _stage_axis(x, vals, R, k_bits, shift, axis):
    """One compare-exchange with a DYNAMIC shift along a fixed axis.
    partner = roll by +-shift; ascending when (n & 2^k) == 0 given via the
    per-element bit mask `k_bits` (int32, 0 or nonzero)."""
    size = R if axis == 0 else LANES
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), axis)
    low_half = (idx & shift) == 0          # this element is the low partner
    # int32 arithmetic for the combined flag: Mosaic rejects selects /
    # equality on i1 vectors ("unsupported truncation")
    asc_i = jnp.where(k_bits == 0, 1, 0)
    low_i = jnp.where(low_half, 1, 0)
    keep_small = asc_i == low_i

    partner = jnp.where(low_half, pltpu.roll(x, size - shift, axis=axis),
                        pltpu.roll(x, shift, axis=axis))
    new_x = jnp.where(keep_small, jnp.minimum(x, partner),
                      jnp.maximum(x, partner))
    if vals is None:
        return new_x, None
    pv = jnp.where(low_half, pltpu.roll(vals, size - shift, axis=axis),
                   pltpu.roll(vals, shift, axis=axis))
    # keys are unique by construction; sentinel ties keep self on both sides
    new_v = jnp.where(new_x == x, vals, pv)
    return new_x, new_v


def _network(x, vals, R, log_n):
    """Bitonic network as nested fori_loops over (k, j) with dynamic
    shifts — keeps the Mosaic program small (the fully unrolled
    O(log^2 n)-stage version takes minutes to compile remotely)."""
    log_r = int(np.log2(R))
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    has_vals = vals is not None
    if not has_vals:
        vals = x  # dummy carry

    def k_bits_of(k):
        # bit k of n = lane * R + row
        kb_row = row_iota & jnp.where(k < log_r,
                                      jnp.left_shift(1, k), 0)
        kb_lane = lane_iota & jnp.where(
            k >= log_r, jnp.left_shift(1, jnp.maximum(k - log_r, 0)), 0)
        return jnp.where(k < log_r, kb_row, kb_lane)

    def stage(k, j, x, v):
        kb = k_bits_of(k)
        s_row = jnp.left_shift(1, j)                   # if j < log_r
        s_lane = jnp.left_shift(1, jnp.maximum(j - log_r, 0))

        def row_branch(args):
            x, v = args
            return _stage_axis(x, v if has_vals else None, R, kb, s_row, 0)

        def lane_branch(args):
            x, v = args
            return _stage_axis(x, v if has_vals else None, R, kb, s_lane, 1)

        nx, nv = jax.lax.cond(j < log_r, row_branch, lane_branch, (x, v))
        return nx, (nv if has_vals else v)

    def inner(i, carry):
        k, x, v = carry
        j = k - 1 - i
        x, v = stage(k, j, x, v)
        return k, x, v

    def outer(k, carry):
        x, v = carry
        _, x, v = jax.lax.fori_loop(0, k, inner, (k, x, v))
        return x, v

    x, vals = jax.lax.fori_loop(1, log_n + 1, outer, (x, vals))
    return x, (vals if has_vals else None)


def _sort_kernel(x_ref, o_ref, *, R, log_n):
    x, _ = _network(x_ref[:], None, R, log_n)
    o_ref[:] = x


def _sort_kv_kernel(x_ref, v_ref, ok_ref, ov_ref, *, R, log_n):
    x, v = _network(x_ref[:], v_ref[:], R, log_n)
    ok_ref[:] = x
    ov_ref[:] = v


def _to_lane_major(flat: jnp.ndarray, R: int) -> jnp.ndarray:
    # n = lane * R + row  =>  [LANES, R] reshape then transpose
    return flat.reshape(LANES, R).T


def _from_lane_major(arr: jnp.ndarray) -> jnp.ndarray:
    return arr.T.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_keys(keys: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Ascending sort of int32 keys; len(keys) must be a power of two
    >= 2*128. Callers pad with INT32_MAX sentinels."""
    n = keys.shape[0]
    log_n = int(np.log2(n))
    assert (1 << log_n) == n and n >= 2 * LANES, n
    R = n // LANES
    x = _to_lane_major(keys, R)
    out = pl.pallas_call(
        functools.partial(_sort_kernel, R=R, log_n=log_n),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return _from_lane_major(out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_kv(keys: jnp.ndarray, values: jnp.ndarray,
            interpret: bool = False):
    """Ascending (key, value) sort; int32 keys, int32 values."""
    n = keys.shape[0]
    log_n = int(np.log2(n))
    assert (1 << log_n) == n and n >= 2 * LANES, n
    R = n // LANES
    x = _to_lane_major(keys, R)
    v = _to_lane_major(values, R)
    ok, ov = pl.pallas_call(
        functools.partial(_sort_kv_kernel, R=R, log_n=log_n),
        out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((R, LANES), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, v)
    return _from_lane_major(ok), _from_lane_major(ov)


def argsort_f32(keys: jnp.ndarray, valid: jnp.ndarray | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Ascending argsort of non-negative float keys (invalid/padded entries
    sink to the end). Returns int32 order of len = next power of two."""
    n = keys.shape[0]
    n_pad = 1 << int(np.ceil(np.log2(max(n, 2 * LANES))))
    k = jnp.asarray(keys, jnp.float32)
    if valid is not None:
        k = jnp.where(valid, k, jnp.float32(np.finfo(np.float32).max))
    bits = jax.lax.bitcast_convert_type(k, jnp.int32)
    # non-negative floats: int bits are order-isomorphic; negatives would
    # need the sign-flip transform (not needed for view depths)
    bits = jnp.pad(bits, (0, n_pad - n), constant_values=INT32_MAX)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, order = sort_kv(bits, iota, interpret=interpret)
    return order
