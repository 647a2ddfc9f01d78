"""Pallas TPU kernel: per-tile front-to-back compositing (forward).

This is the TPU-native replacement for the reference's renderCUDA
(cuda_rasterizer/forward.cu:261-392). Key mapping of the CUDA design onto
the TPU architecture:

  * CUDA: one thread block per 8x8 tile, one thread per pixel, warp-level
    fetch of 64-gaussian batches into shared memory, sequential alpha
    blending per pixel with warp-vote early exit.
  * TPU: one grid program per 16x128 tile (lane-aligned); pair data for the
    tile is DMA'd from HBM in depth-ordered chunks; per-chunk alphas are a
    [npix, chunk] VPU computation; the front-to-back recurrence becomes a
    log-space prefix sum computed as a [npix, chunk] x [chunk, chunk]
    upper-triangular MXU matmul; channel accumulation (RGB + 64-D language
    features + depth) is a [npix, chunk] x [chunk, C] MXU matmul; early
    termination is a scalar `while_loop` break when every pixel's
    transmittance crosses 1e-4 (forward.cu:353-357 semantics: the
    contribution test uses the all-alpha running product, which is
    monotone, so per-pixel termination freezes exactly like the reference).

Pair arrays are pre-gathered in sorted (tile, depth) order by
ops/binning.py + XLA gathers, so every DMA here is a contiguous slice and
the backward pass can write per-pair gradients without atomics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legslam_tpu.config import ALPHA_MAX, ALPHA_MIN, T_TERMINATE

# pair_geo row layout ([GEO_ROWS, PAIRS]):
GEO_X, GEO_Y, GEO_A, GEO_B, GEO_C, GEO_OP = 0, 1, 2, 3, 4, 5
GEO_ROWS = 8  # padded to the f32 sublane tile

LOG_TERM = float(np.log(T_TERMINATE))


def _mm(x, y, mm_dtype):
    """[m,k] @ [k,n] with f32 accumulation; bf16 inputs when requested
    (native MXU rate — f32 operands cost ~4x on v5e)."""
    dt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32
    return jax.lax.dot_general(x.astype(dt), y.astype(dt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _power_basis(pix_lin, tile_w, tile_h):
    """[npix, 8] quadratic pixel basis in TILE-CENTERED coordinates:
    [1, x, y, x^2, y^2, x*y, 0, 0].

    The per-(pixel, pair) Gaussian exponent is a quadratic form in the
    pixel coordinate, so the whole [npix, chunk] `power` plane is ONE tiny
    MXU matmul basis @ coef instead of a ~11-op VPU chain per element (the
    kernels' dominant VPU cost at bench shapes). Tile-centered coordinates
    keep |x| <= 64, bounding the expansion's cancellation error at
    ~ca*64^2*eps_f32 ~ 1e-3 worst-case for the smallest (lowpass-clamped)
    gaussians — measured end-to-end color error vs the VPU path is pinned
    in tests/test_power_mode.py. Rows 6-7 pad the f32 sublane tile."""
    npix = tile_w * tile_h
    xl = (pix_lin % tile_w).astype(jnp.float32) - (tile_w - 1) * 0.5
    yl = (pix_lin // tile_w).astype(jnp.float32) - (tile_h - 1) * 0.5
    ones = jnp.ones((npix, 1), jnp.float32)
    return jnp.concatenate(
        [ones, xl, yl, xl * xl, yl * yl, xl * yl,
         jnp.zeros((npix, 2), jnp.float32)], axis=1)


def _power_coef(gxl, gyl, ca, cb, cc):
    """[8, chunk] per-pair coefficient rows for the quadratic basis.
    gxl/gyl are the gaussian centers in the SAME tile-centered frame."""
    c0 = -0.5 * (ca * gxl * gxl + cc * gyl * gyl) - cb * gxl * gyl
    c1 = ca * gxl + cb * gyl
    c2 = cc * gyl + cb * gxl
    zeros = jnp.zeros_like(ca)
    return jnp.concatenate(
        [c0, c1, c2, -0.5 * ca, -0.5 * cc, -cb, zeros, zeros], axis=0)


def _power_mm(basis, coef):
    """power[npix, chunk] = basis @ coef; k=8 so the matmul is ~3% of the
    prefix matmul's flops even at HIGHEST (f32) precision."""
    return jax.lax.dot_general(
        basis, coef, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _sep_power(gx, gy, ca, cb, cc, xs, ys, tile_h, tile_w, mode):
    """Separable evaluation of the [npix, chunk] Gaussian exponent.

    power(p, g) = -.5*ca*dx^2 - .5*cc*dy^2 - cb*dx*dy (the per-thread
    quadratic of forward.cu:340-350) depends on the pixel only through
    x(p) = p % tile_w and y(p) = p // tile_w, so the x-only factors are
    computed at [tile_w, chunk] (16x cheaper than the flat [npix, chunk]
    chain) and the y-only ones at [tile_h, chunk] (128x cheaper); the
    cross term is rank-1 in (x, y). Only the final combine runs at full
    [npix, chunk] size — ~3 VPU ops (+broadcast copies in "sep" mode)
    instead of the naive 11-op chain, which is the kernels' dominant VPU
    cost at bench shapes.

    xs/ys are [tile_w, 1] / [tile_h, 1] f32 coordinate columns in "sep3"
    mode; in "sep" mode ys is instead the flat [npix, 1] global py column.
    "sep3" factors BOTH axes and combines via 3-D broadcasting
    ([tile_h, tile_w, chunk], collapsed afterwards; ~3 full-size ops);
    "sep" factors only x — whose broadcast is a supported sublane-tile
    concat (x varies with period tile_w along the flat pixel axis) — and
    keeps the y direction elementwise via Horner in dy (~7 full-size ops;
    the y-broadcast would need an element-repeat Mosaic doesn't provide).
    """
    fx = gx - xs                        # [tile_w, chunk]
    termx = (-0.5 * ca) * (fx * fx)
    bfx = cb * fx
    if mode == "sep3":
        fy = gy - ys                    # [tile_h, chunk]
        termy = (-0.5 * cc) * (fy * fy)
        p3 = (termx[None] + termy[:, None]) - bfx[None] * fy[:, None]
        return p3.reshape(tile_h * tile_w, gx.shape[1])
    # "sep": power = termx(x) - (bfx(x) + 0.5*cc*dy) * dy; derive the
    # tile count from the flat py column (callers pass [npix, 1] ys here)
    n_rows = ys.shape[0] // xs.shape[0]
    termx_t = jnp.concatenate([termx] * n_rows, axis=0)   # [npix, chunk]
    bfx_t = jnp.concatenate([bfx] * n_rows, axis=0)
    dy = gy - ys                        # ys = flat py: [npix, chunk]
    return termx_t - (bfx_t + (0.5 * cc) * dy) * dy


def _tri_prefix(log1m, u, mm_dtype):
    """log1m @ triangular-ones. The prefix feeds exp(), so input
    quantization error compounds into the transmittance; under bf16 we
    split the operand hi/lo into two bf16 matmuls (error ~2^-16, f32-like)
    instead of one (2^-8). u must already carry the matmul dtype."""
    if mm_dtype == "bfloat16":
        hi = log1m.astype(jnp.bfloat16)
        lo = (log1m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # one [2*npix, chunk] matmul instead of two: identical f32
        # accumulation per half (bit-exact), but a single MXU dispatch
        # amortizes the pipeline fill across both halves
        npix = log1m.shape[0]
        both = jnp.concatenate([hi, lo], axis=0)
        acc = jax.lax.dot_general(both, u, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return acc[:npix] + acc[npix:]
    return jax.lax.dot_general(log1m, u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_kernel(tile_start, tile_count, geo_hbm, feats_hbm, uexcl,
                    out_ref, tfin_ref, *refs, chunk: int, tile_w: int,
                    tile_h: int, ntx: int, c_out: int, pairs_pad: int,
                    n_buckets: int, mm_dtype: str = "float32",
                    power_mode: str = "vpu", emit_kfin: bool = False):
    kfin_ref = refs[0] if emit_kfin else None
    t = pl.program_id(0)
    npix = tile_h * tile_w

    tx = (t % ntx) * tile_w
    ty = (t // ntx) * tile_h
    # flattened pixel coordinates [npix, 1]
    pix_lin = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    if power_mode == "mxu":
        basis = _power_basis(pix_lin, tile_w, tile_h)
        cx = tx + (tile_w - 1) * 0.5   # tile-centered frame origin
        cy = ty + (tile_h - 1) * 0.5
    elif power_mode in ("sep", "sep3"):
        xs = (tx + jax.lax.broadcasted_iota(
            jnp.int32, (tile_w, 1), 0)).astype(jnp.float32)
        if power_mode == "sep3":
            ys = (ty + jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, 1), 0)).astype(jnp.float32)
        else:   # "sep" keeps the y direction elementwise (flat py)
            ys = (ty + pix_lin // tile_w).astype(jnp.float32)
    else:
        px = (tx + pix_lin % tile_w).astype(jnp.float32)
        py = (ty + pix_lin // tile_w).astype(jnp.float32)

    def body(geo_buf, feat_buf, geo_sem, feat_sem):
        # geo_buf/feat_buf are double-buffered ([2, ...]); fetch k+1 is in
        # flight while chunk k computes
        def dma_pair(base0, k, slot):
            off = pl.multiple_of(base0 + k * chunk, chunk)
            g = pltpu.make_async_copy(
                geo_hbm.at[:, pl.ds(off, chunk)], geo_buf.at[slot],
                geo_sem.at[slot])
            f = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(off, chunk), :], feat_buf.at[slot],
                feat_sem.at[slot])
            return off, g, f

        def start_fetch(base0, k):
            _, g, f = dma_pair(base0, k, k % 2)
            g.start()
            f.start()

        def wait_fetch(base0, k):
            off, g, f = dma_pair(base0, k, k % 2)
            g.wait()
            f.wait()
            return off

        def bucket_step(bcarry):
            b, log_t_all0, log_t_fin0, acc0 = bcarry
            start = tile_start[t * n_buckets + b]
            count = tile_count[t * n_buckets + b]
            base0 = (start // chunk) * chunk
            n_chunks = (start + count - base0 + chunk - 1) // chunk

            @pl.when(n_chunks > 0)
            def _():
                start_fetch(base0, 0)

            def step(carry):
                k, log_t_all, log_t_fin, acc = carry
                off = wait_fetch(base0, k)

                @pl.when(k + 1 < n_chunks)
                def _():
                    start_fetch(base0, k + 1)

                slot = k % 2
                # lane-broadcast rows [1, chunk]
                gx = geo_buf[slot, GEO_X:GEO_X + 1, :]
                gy = geo_buf[slot, GEO_Y:GEO_Y + 1, :]
                ca = geo_buf[slot, GEO_A:GEO_A + 1, :]
                cb = geo_buf[slot, GEO_B:GEO_B + 1, :]
                cc = geo_buf[slot, GEO_C:GEO_C + 1, :]
                op = geo_buf[slot, GEO_OP:GEO_OP + 1, :]

                if power_mode == "mxu":
                    power = _power_mm(
                        basis, _power_coef(gx - cx, gy - cy, ca, cb, cc))
                elif power_mode in ("sep", "sep3"):
                    power = _sep_power(gx, gy, ca, cb, cc, xs, ys,
                                       tile_h, tile_w, power_mode)
                else:
                    dx = gx - px          # [npix, chunk]
                    dy = gy - py
                    power = (-0.5 * (ca * dx * dx + cc * dy * dy)
                             - cb * dx * dy)

                lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                pos = off + lane
                # window-mask folded into the [1, chunk] opacity row (a
                # full-size `& in_range` on keep costs a [npix, chunk] op;
                # op == 0 already forces alpha < ALPHA_MIN => keep False)
                in_range = (pos >= start) & (pos < (start + count))
                opm = jnp.where(in_range, op, 0.0)

                # no min(power, 0) guard: power > 0 rows are killed by the
                # keep mask below, and the inf/NaN that op*exp(power) can
                # produce there never escapes the where (NaN compares
                # False, jnp.where selects 0)
                alpha = opm * jnp.exp(power)
                alpha = jnp.minimum(alpha, ALPHA_MAX)
                keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
                alpha = jnp.where(keep, alpha, 0.0)

                log1m = jnp.log1p(-alpha)
                # exclusive prefix along chunk axis via triangular matmul
                prefix = _tri_prefix(log1m, uexcl[:], mm_dtype)
                log_t_exc = log_t_all + prefix
                log_t_inc = log_t_exc + log1m
                contrib = log_t_inc >= LOG_TERM
                w = jnp.where(contrib, alpha * jnp.exp(log_t_exc), 0.0)

                acc = acc + _mm(w, feat_buf[slot], mm_dtype)
                log_t_all = log_t_all + jnp.sum(log1m, axis=1,
                                                keepdims=True)
                log_t_fin = log_t_fin + jnp.sum(
                    jnp.where(contrib, log1m, 0.0), axis=1, keepdims=True)
                return k + 1, log_t_all, log_t_fin, acc

            def cond(carry):
                k, log_t_all, _, _ = carry
                return (k < n_chunks) & (jnp.max(log_t_all) >= LOG_TERM)

            k_fin, log_t_all, log_t_fin, acc = jax.lax.while_loop(
                cond, step,
                (jnp.zeros((), jnp.int32), log_t_all0, log_t_fin0, acc0))

            # early termination leaves fetch k_fin in flight — drain it so
            # the semaphores are clean for the next bucket/grid step
            @pl.when(k_fin < n_chunks)
            def _():
                wait_fetch(base0, k_fin)
            if emit_kfin:
                # per-tile chunks-processed watermark (feeds the
                # termination-aware binning trim, ops/binning.py
                # trim_binning); only meaningful for the flat n_buckets=1
                # layout, where one bucket covers the whole tile range
                kfin_ref[0] = jnp.full(kfin_ref.shape[1:], k_fin,
                                       jnp.int32)
            return b + 1, log_t_all, log_t_fin, acc

        def bucket_cond(bcarry):
            b, log_t_all, _, _ = bcarry
            return (b < n_buckets) & (jnp.max(log_t_all) >= LOG_TERM)

        init = (jnp.zeros((), jnp.int32),
                jnp.zeros((npix, 1), jnp.float32),
                jnp.zeros((npix, 1), jnp.float32),
                jnp.zeros((npix, c_out), jnp.float32))
        _, _, log_t_fin, acc = jax.lax.while_loop(bucket_cond, bucket_step,
                                                  init)
        out_ref[0] = acc
        tfin_ref[0] = jnp.exp(log_t_fin)

    pl.run_scoped(
        body,
        geo_buf=pltpu.VMEM((2, GEO_ROWS, chunk), jnp.float32),
        feat_buf=pltpu.VMEM((2, chunk, c_out), feats_hbm.dtype),
        geo_sem=pltpu.SemaphoreType.DMA((2,)),
        feat_sem=pltpu.SemaphoreType.DMA((2,)),
    )




def _bitcast_f32_to_bf16bits(x: jnp.ndarray) -> jnp.ndarray:
    """[..., K] f32 -> [..., 2K] bf16 raw halves (no rounding)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint16)      # [..., K, 2]
    return jax.lax.bitcast_convert_type(
        u.reshape(x.shape[:-1] + (2 * x.shape[-1],)), jnp.bfloat16)


def _bitcast_bf16bits_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 2K] bf16 raw halves -> [..., K] f32 (exact inverse)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint16)
    return jax.lax.bitcast_convert_type(
        u.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2)), jnp.float32)


@jax.custom_vjp
def _take_pairs(feats: jnp.ndarray, geo_g: jnp.ndarray, idx: jnp.ndarray,
                nvalid: jnp.ndarray):
    """Gather pair features AND geometry in ONE row gather.

    The TPU gather engine is ROW-RATE-bound (~40 ns/row measured: an
    8-wide f32 gather costs the same as a 128-wide bf16 one), so fusing
    the [P, 8] geometry rows into the feature rows — as raw bf16 halves
    when feats are bf16, plain f32 lanes otherwise — halves the gather
    cost vs two separate takes. The custom VJP likewise runs ONE merged
    scatter-add (f32 accumulation) instead of two row-rate-bound ones.

    Returns (pf [N, C], geo [N, 8] f32).
    """
    c = feats.shape[1]
    if feats.dtype == jnp.bfloat16:
        packed = jnp.concatenate(
            [feats, _bitcast_f32_to_bf16bits(geo_g)], axis=1)
    else:
        packed = jnp.concatenate([feats, geo_g], axis=1)
    out = _chunked_take_raw(packed, idx, nvalid)
    pf = out[:, :c]
    if feats.dtype == jnp.bfloat16:
        geo = _bitcast_bf16bits_to_f32(out[:, c:])
    else:
        geo = out[:, c:]
    return pf, geo


def _chunked_take_raw(src, idx, nvalid):
    """Row gather via lax.map chunks: XLA's single big gather both
    compile-hangs and runs slowly on this TPU stack; 64 chunked gathers
    compile fast and run ~4x faster (measured). The gather engine is
    ROW-RATE-bound (~40 ns/row), so chunks whose start lies past `nvalid`
    (valid pairs occupy the sorted prefix; the rest are sentinels the
    kernel never reads) skip the gather via lax.cond and emit zeros."""
    n = idx.shape[0]
    n_chunks = 64
    assert n % n_chunks == 0, (n, n_chunks)
    rows = n // n_chunks

    def one(args):
        ix, active = args
        return jax.lax.cond(
            active,
            lambda: src[ix],
            lambda: jnp.zeros((rows,) + src.shape[1:], src.dtype))

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * rows
    out = jax.lax.map(one, (idx.reshape(n_chunks, rows), starts < nvalid))
    return out.reshape((n,) + src.shape[1:])


def _take_pairs_fwd(feats, geo_g, idx, nvalid):
    return _take_pairs(feats, geo_g, idx, nvalid), (idx, feats, geo_g, nvalid)


def _take_pairs_bwd(res, cots):
    idx, feats, geo_g, nvalid = res
    gpf, ggeo = cots
    c = feats.shape[1]
    n = idx.shape[0]
    width = c + geo_g.shape[1]
    zero = jnp.zeros((feats.shape[0], width), jnp.float32)
    # Slab-skip: valid pairs occupy the sorted prefix; rows past nvalid
    # carry sentinel gid == P and are dropped by mode="drop" regardless,
    # so scattering only a static prefix that covers nvalid is EXACT. The
    # scatter engine is row-rate-bound (~40 ns/row), so skipping the
    # sentinel tail saves proportional time (~25% at bench occupancy).
    # 32 quantized prefix lengths via lax.switch keep shapes static
    # (4 -> 8 -> 32 over rounds: at the steady-state operating points —
    # 531k valid rows at 1200x680, 355k at 640x480 — the 1/8 quanta
    # rounded up to 655k/393k scattered rows; 1/32 quanta scatter
    # 557k/360k, ~2.6/0.9 ms less at ~26 ns/row, and the extra switch
    # executables are tiny).
    n_slabs = 32
    assert n % n_slabs == 0, (n, n_slabs)
    slab = n // n_slabs

    def make(k):
        m = slab * (k + 1)

        def f():
            gm = jnp.concatenate([gpf[:m].astype(jnp.float32),
                                  ggeo[:m].astype(jnp.float32)], axis=1)
            return zero.at[idx[:m]].add(gm, mode="drop")
        return f

    sel = jnp.clip((nvalid + slab - 1) // slab - 1, 0, n_slabs - 1)
    acc = jax.lax.switch(sel.astype(jnp.int32),
                         [make(k) for k in range(n_slabs)])
    return (acc[:, :c].astype(feats.dtype), acc[:, c:],
            np.zeros(idx.shape, jax.dtypes.float0),
            np.zeros((), jax.dtypes.float0))


_take_pairs.defvjp(_take_pairs_fwd, _take_pairs_bwd)


def prepare_pairs(binning, mean2d: jnp.ndarray, conic: jnp.ndarray,
                  opacity: jnp.ndarray, feats: jnp.ndarray,
                  max_pairs: int, chunk: int = 256, n_buckets: int = 1):
    """Gather per-pair geometry/features in sorted (tile, depth) order.

    Valid pairs occupy the front of the sorted binning arrays (sentinels
    sink to the end), so truncating at `max_pairs` keeps everything as long
    as num_rendered <= max_pairs; overflowing tiles are clipped at the
    range level. Unaligned tile starts are handled by the kernel's
    round-down DMA base + in-range mask.

    Returns (start [ntiles], count [ntiles], pair_geo [8, max_pairs],
    pair_feats [max_pairs, C_pad]).
    """
    if n_buckets > 1:
        # BucketedBinning: pair_gid already capped per bucket; ranges are
        # flat [ntiles, B] -> [ntiles*B]. Valid pairs are per-bucket
        # prefixes, not one global prefix — no chunk skipping.
        gid = binning.pair_gid
        start = binning.tile_start.reshape(-1).astype(jnp.int32)
        count = binning.tile_count.reshape(-1).astype(jnp.int32)
        nvalid = jnp.asarray(gid.shape[0], jnp.int32)
    else:
        gid = binning.pair_gid[:max_pairs]
        start = jnp.minimum(binning.tile_start, max_pairs).astype(jnp.int32)
        end = jnp.minimum(binning.tile_start + binning.tile_count, max_pairs)
        count = (end - start).astype(jnp.int32)
        nvalid = jnp.minimum(binning.num_rendered,
                             max_pairs).astype(jnp.int32)

    # per-gaussian packed geometry rows, fused into the SAME row gather as
    # the features (row-rate-bound engine: one wide gather ~= half of two)
    zeros = jnp.zeros_like(opacity)
    geo_g = jnp.stack([mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1],
                       conic[:, 2], opacity, zeros, zeros], axis=1)  # [P, 8]

    c = feats.shape[1]
    c_pad = -(-c // 128) * 128  # lane-tile alignment for the HBM DMA slices
    if c_pad != c:
        feats = jnp.pad(feats, ((0, 0), (0, c_pad - c)))
    pf, geo_rows = _take_pairs(feats, geo_g, gid, nvalid)
    geo = geo_rows.T                                      # [8, max_pairs]
    return start, count, geo, pf


@functools.partial(
    jax.jit,
    static_argnames=("tile_w", "tile_h", "ntx", "ntiles", "chunk",
                     "interpret", "n_buckets", "mm_dtype", "power_mode",
                     "emit_kfin"))
def composite_tiles_pallas(tile_start: jnp.ndarray, tile_count: jnp.ndarray,
                           pair_geo: jnp.ndarray, pair_feats: jnp.ndarray,
                           *, tile_w: int, tile_h: int, ntx: int,
                           ntiles: int, chunk: int = 256,
                           interpret: bool = False, n_buckets: int = 1,
                           mm_dtype: str = "float32",
                           power_mode: str = "vpu",
                           emit_kfin: bool = False):
    """Run the forward compositing kernel.

    Args:
      tile_start/tile_count: [ntiles * n_buckets] int32 flat ranges into
        the pair arrays (bucket-major per tile; n_buckets=1 is the flat
        single-sort layout).
      pair_geo: [8, PAIRS_PAD] f32 rows (x, y, conic a/b/c, opacity, pad).
      pair_feats: [PAIRS_PAD, C] f32 blend features (rgb+lf+depth, padded
        lanes OK).
      emit_kfin: also return kfin [ntiles, 8, 128] int32 whose [:, 0, 0]
        is the per-tile chunks-processed count (the T<1e-4 termination
        watermark; feeds ops/binning.trim_binning). Flat layout only.

    Returns (acc [ntiles, npix, C], t_final [ntiles, npix, 1]) and, with
    emit_kfin, the kfin array.
    """
    assert not (emit_kfin and n_buckets > 1), \
        "kfin is only defined for the flat single-bucket layout"
    pairs_pad = pair_geo.shape[1]
    c_out = pair_feats.shape[1]
    npix = tile_h * tile_w
    # strictly-upper-triangular ones: prefix[j] = sum_{k<j} x[k]
    udt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32
    uexcl = jnp.triu(jnp.ones((chunk, chunk), udt), k=1)

    kernel = functools.partial(
        _forward_kernel, chunk=chunk, tile_w=tile_w, tile_h=tile_h,
        ntx=ntx, c_out=c_out, pairs_pad=pairs_pad, n_buckets=n_buckets,
        mm_dtype=mm_dtype, power_mode=power_mode, emit_kfin=emit_kfin)

    out_specs = [
        pl.BlockSpec((1, npix, c_out), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npix, 1), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ntiles, npix, c_out), jnp.float32),
        jax.ShapeDtypeStruct((ntiles, npix, 1), jnp.float32),
    ]
    if emit_kfin:
        out_specs.append(
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((ntiles, 8, 128), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # geo (manual DMA)
            pl.BlockSpec(memory_space=pltpu.HBM),   # feats (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uexcl
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tile_start, tile_count, pair_geo, pair_feats, uexcl)
    return out if emit_kfin else (out[0], out[1])


def composite_image_pallas(binning, mean2d, conic, opacity, feats,
                           width: int, height: int, tile_w: int, tile_h: int,
                           max_pairs: int, chunk: int = 256,
                           interpret: bool = False,
                           differentiable: bool = False,
                           n_buckets: int = 1,
                           mm_dtype: str = "float32",
                           power_mode: str = "vpu",
                           emit_kfin: bool = False):
    """Full-image forward compositing via the Pallas kernel.

    Accepts either a flat Binning (n_buckets=1) or a BucketedBinning (pass
    the matching n_buckets). Returns (img [H, W, C], t_final [H, W]) with
    C = feats channel count — plus, with emit_kfin, the [ntiles] int32
    per-tile termination watermark (chunks processed before T<1e-4; feeds
    ops/binning.trim_binning). With differentiable=True, gradients flow to
    mean2d/conic/opacity/feats through the Pallas backward kernel + the
    gathers' scatter-add VJP.
    """
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    ntiles = ntx * nty
    c = feats.shape[1]
    if mm_dtype == "bfloat16":
        # store/gather/DMA pair features at half traffic; the VJP of this
        # cast returns the (f32-accumulated) scatter-add grads to f32
        feats = feats.astype(jnp.bfloat16)
    start, count, geo, pf = prepare_pairs(
        binning, mean2d, conic, opacity, feats, max_pairs, chunk,
        n_buckets=n_buckets)
    if differentiable:
        from legslam_tpu.ops.pallas.composite_bwd import make_composite_vjp
        fn = make_composite_vjp(tile_w, tile_h, ntx, ntiles, chunk,
                                interpret, n_buckets, mm_dtype, power_mode,
                                emit_kfin)
        out = fn(start, count, geo, pf)
    else:
        out = composite_tiles_pallas(
            start, count, geo, pf, tile_w=tile_w, tile_h=tile_h, ntx=ntx,
            ntiles=ntiles, chunk=chunk, interpret=interpret,
            n_buckets=n_buckets, mm_dtype=mm_dtype, power_mode=power_mode,
            emit_kfin=emit_kfin)
    acc, tfin = out[0], out[1]
    c_out = acc.shape[-1]
    img = acc.reshape(nty, ntx, tile_h, tile_w, c_out)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        nty * tile_h, ntx * tile_w, c_out)[:height, :width, :c]
    tf = tfin.reshape(nty, ntx, tile_h, tile_w)
    tf = tf.transpose(0, 2, 1, 3).reshape(
        nty * tile_h, ntx * tile_w)[:height, :width]
    if emit_kfin:
        return img, tf, out[2][:, 0, 0]
    return img, tf
