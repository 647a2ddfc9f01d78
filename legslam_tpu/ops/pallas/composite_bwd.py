"""Pallas TPU kernel: compositing backward + custom VJP wiring.

Replaces the reference's reverse-traversal backward with atomicAdd
accumulation (cuda_rasterizer/backward.cu:399-612). Two TPU-first changes:

  1. No reverse traversal: the alpha gradient needs the suffix sum
     S_k = sum_{j>k} dL/dw_j * w_j; we compute Stotal in a first forward
     pass and take S_k = Stotal - inclusive_prefix_k in a second forward
     pass (prefixes via upper-triangular MXU matmuls, like the forward).
  2. No atomics: gradients are written in PAIR space (each pair belongs to
     exactly one tile). Chunk windows at tile boundaries overlap because of
     the aligned round-down base, so writes are read-modify-write DMAs —
     race-free because the Pallas grid is sequential on a TPU core. The
     pair->gaussian reduction then rides the autodiff VJP of the XLA
     gathers in prepare_pairs (a scatter-add).

Gradient contract parity (see ops/composite.py): straight-through on the
0.99 alpha clamp (backward.cu:591-607: dL_dG = opacity * dL_dalpha ignores
the clamp), hard masks for the skip rules, and the background/T_final
coupling dL_dalpha += -T_final/(1-alpha) * <bg, dL_dpixel>
(backward.cu:598-603) arriving here as the t_final cotangent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legslam_tpu.config import ALPHA_MAX, ALPHA_MIN, T_TERMINATE
from legslam_tpu.ops.pallas.composite import (
    GEO_A,
    GEO_B,
    GEO_C,
    GEO_OP,
    GEO_ROWS,
    GEO_X,
    GEO_Y,
    _mm,
    _power_basis,
    _power_coef,
    _power_mm,
    _sep_power,
    composite_tiles_pallas,
)

LOG_TERM = float(np.log(T_TERMINATE))


def _alpha_terms(geo, px, py, start, count, off, chunk, *,
                 power_mode="vpu", basis=None, cx=None, cy=None):
    """Recompute per-chunk alpha quantities; `geo` is the loaded
    [GEO_ROWS, chunk] block (an array, so callers can index a
    double-buffered ref slot first). With power_mode="mxu" the exponent
    plane comes from the quadratic-basis matmul (see composite._power_mm)
    and gx/gy are returned in the tile-centered frame (all downstream
    moment formulas are translation invariant)."""
    gx = geo[GEO_X:GEO_X + 1, :]
    gy = geo[GEO_Y:GEO_Y + 1, :]
    ca = geo[GEO_A:GEO_A + 1, :]
    cb = geo[GEO_B:GEO_B + 1, :]
    cc = geo[GEO_C:GEO_C + 1, :]
    op = geo[GEO_OP:GEO_OP + 1, :]
    if power_mode == "mxu":
        gx = gx - cx
        gy = gy - cy
        power = _power_mm(basis, _power_coef(gx, gy, ca, cb, cc))
    elif power_mode in ("sep", "sep3"):
        # sep mode passes the factored coordinate columns: px = xs
        # [tile_w, 1], py = ys [tile_h, 1]
        power = _sep_power(gx, gy, ca, cb, cc, px, py, py.shape[0],
                           px.shape[0], power_mode)
    else:
        dx = gx - px
        dy = gy - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pos = off + lane
    # window-mask folded into the [1, chunk] opacity row (see the forward
    # kernel): op == 0 forces alpha < ALPHA_MIN => keep False, and every
    # gradient below is gated on keep/dpower == 0
    in_range = (pos >= start) & (pos < (start + count))
    op = jnp.where(in_range, op, 0.0)
    g_exp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * g_exp
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(keep, alpha, 0.0)
    return dict(gx=gx, gy=gy, ca=ca, cb=cb, cc=cc, op=op,
                g_exp=g_exp, alpha=alpha, keep=keep)


def _backward_kernel(tile_start, tile_count, geo_hbm, feats_hbm,
                     gout_ref, gtfin_ref, tfin_ref, acc_ref, uexcl, uincl,
                     dgeo0_hbm, dfeats0_hbm,
                     dgeo_hbm, dfeats_hbm, *, chunk: int, tile_w: int,
                     tile_h: int, ntx: int, c_out: int, pairs_pad: int,
                     n_buckets: int, mm_dtype: str = "float32",
                     power_mode: str = "vpu"):
    del dgeo0_hbm, dfeats0_hbm  # zero inputs aliased onto the outputs
    t = pl.program_id(0)
    npix = tile_h * tile_w

    tx = (t % ntx) * tile_w
    ty = (t // ntx) * tile_h
    pix_lin = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    if power_mode == "mxu":
        # shared [npix, 8] quadratic basis: feeds BOTH the power matmul
        # and the pixel-moment reductions (tile-centered frame; the
        # moment identities are translation invariant)
        px = py = None
        basis = _power_basis(pix_lin, tile_w, tile_h)
        cx = tx + (tile_w - 1) * 0.5
        cy = ty + (tile_h - 1) * 0.5
    else:
        pxf = (tx + pix_lin % tile_w).astype(jnp.float32)
        pyf = (ty + pix_lin // tile_w).astype(jnp.float32)
        # the moment basis always uses the flat global pixel coordinates;
        # sep mode additionally hands _alpha_terms the factored coordinate
        # columns (xs [tile_w, 1], ys [tile_h, 1]) in the px/py slots
        basis = jnp.concatenate(
            [jnp.ones_like(pxf), pxf, pyf, pxf * pxf, pyf * pyf,
             pxf * pyf, jnp.zeros((npix, 2), jnp.float32)], axis=1)
        if power_mode in ("sep", "sep3"):
            px = (tx + jax.lax.broadcasted_iota(
                jnp.int32, (tile_w, 1), 0)).astype(jnp.float32)
            # "sep3" factors y too; "sep" keeps y elementwise (flat py)
            py = pyf if power_mode == "sep" else \
                (ty + jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, 1), 0)).astype(jnp.float32)
        else:
            px, py = pxf, pyf
        cx = cy = None

    gout = gout_ref[0]            # [npix, C]
    gtfin = gtfin_ref[0]          # [npix, 1]
    tfin = tfin_ref[0]            # [npix, 1]
    gt_term = gtfin * tfin        # per-pixel gT * T_final
    # Stotal = sum_j dw_j w_j = <gout, sum_j w_j f_j> = <gout, acc>: the
    # forward output IS the total, so no recomputation pass is needed
    stot = jnp.sum(gout * acc_ref[0], axis=1, keepdims=True)

    def body(geo_buf, feat_buf, dgeo_buf, dfeat_buf, fsem, rsem, wsem):
        # all four working buffers are double-buffered ([2, ...]): input
        # fetch k+1 and accumulator read k+1 fly while chunk k computes —
        # the serialized version paid ~6 DMA round trips of latency per
        # chunk (ms-scale per step at bench shapes). Accumulator WRITES
        # stay synchronous: window k+1's read may start only once write
        # k-1 on its slot is done, which synchronous writes give for free
        # (and cross-tile boundary overlaps stay ordered by the sequential
        # grid).
        # the HBM grad accumulators arrive ZEROED from XLA via
        # input_output_aliasing (a fused fill) — zeroing them here took
        # ~4k serial DMA round trips in the t == 0 program, a fixed
        # ~10 ms head on every backward call

        def _fetch_pair(base0, k):
            off = pl.multiple_of(base0 + k * chunk, chunk)
            slot = k % 2
            g = pltpu.make_async_copy(
                geo_hbm.at[:, pl.ds(off, chunk)], geo_buf.at[slot],
                fsem.at[slot, 0])
            f = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(off, chunk), :], feat_buf.at[slot],
                fsem.at[slot, 1])
            return off, g, f

        def _rd_pair(base0, k):
            off = pl.multiple_of(base0 + k * chunk, chunk)
            slot = k % 2
            g = pltpu.make_async_copy(
                dgeo_hbm.at[:, pl.ds(off, chunk)], dgeo_buf.at[slot],
                rsem.at[slot, 0])
            f = pltpu.make_async_copy(
                dfeats_hbm.at[pl.ds(off, chunk), :], dfeat_buf.at[slot],
                rsem.at[slot, 1])
            return off, g, f

        def _wr_pair(base0, k):
            off = pl.multiple_of(base0 + k * chunk, chunk)
            slot = k % 2
            g = pltpu.make_async_copy(
                dgeo_buf.at[slot], dgeo_hbm.at[:, pl.ds(off, chunk)],
                wsem.at[slot, 0])
            f = pltpu.make_async_copy(
                dfeat_buf.at[slot], dfeats_hbm.at[pl.ds(off, chunk), :],
                wsem.at[slot, 1])
            return g, f

        def start_wr(base0, k):
            g, f = _wr_pair(base0, k)
            g.start()
            f.start()

        def wait_wr(base0, k):
            g, f = _wr_pair(base0, k)
            g.wait()
            f.wait()

        def start_fetch(base0, k):
            _, g, f = _fetch_pair(base0, k)
            g.start()
            f.start()

        def wait_fetch(base0, k):
            off, g, f = _fetch_pair(base0, k)
            g.wait()
            f.wait()
            return off

        def start_rd(base0, k):
            _, g, f = _rd_pair(base0, k)
            g.start()
            f.start()

        def wait_rd(base0, k):
            _, g, f = _rd_pair(base0, k)
            g.wait()
            f.wait()

        # ---- pass B: per-pair gradients ----
        def bucket_b(bcarry):
          b, log_t_all0, s_prefix0 = bcarry
          start = tile_start[t * n_buckets + b]
          count = tile_count[t * n_buckets + b]
          base0 = (start // chunk) * chunk
          n_chunks = (start + count - base0 + chunk - 1) // chunk

          @pl.when(n_chunks > 0)
          def _():
              start_fetch(base0, 0)
              start_rd(base0, 0)

          def pass_b(carry):
            k, log_t_all, s_prefix = carry
            slot = k % 2
            off = wait_fetch(base0, k)

            @pl.when(k + 1 < n_chunks)
            def _():
                start_fetch(base0, k + 1)

            a = _alpha_terms(geo_buf[slot], px, py, start, count, off,
                             chunk, power_mode=power_mode, basis=basis,
                             cx=cx, cy=cy)
            alpha = a["alpha"]
            log1m = jnp.log1p(-alpha)
            # single-pass matmuls here (no hi/lo split): this prefix only
            # feeds GRADIENT weights (t_exc) — 2^-8 operand rounding is
            # far below SGD noise, and the split doubled the dominant
            # per-chunk matmul cost. The forward keeps hi/lo (it renders).
            prefix = _mm(log1m, uexcl[:], mm_dtype)
            log_t_exc = log_t_all + prefix
            contrib = (log_t_exc + log1m) >= LOG_TERM
            t_exc = jnp.exp(log_t_exc)
            w = jnp.where(contrib, alpha * t_exc, 0.0)
            # gout @ feats^T: transpose feats via dims (contract on axis 1
            # of both) — keep via _mm by passing feat_buf already [chunk, C]
            dw = jax.lax.dot_general(
                gout.astype(feat_buf.dtype) if mm_dtype == "bfloat16"
                else gout, feat_buf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            q = dw * w
            incl = s_prefix + _mm(q, uincl[:], mm_dtype)
            s_k = stot - incl                           # suffix sum, [npix, chunk]

            # alpha <= ALPHA_MAX by construction, so 1 - alpha >= 0.01:
            # no clamp needed before the divide
            one_minus = 1.0 - alpha
            dalpha = jnp.where(contrib, dw * t_exc, 0.0) \
                - (s_k + jnp.where(contrib, gt_term, 0.0)) / one_minus
            # skips zero the gradient entirely (hard masks)
            dalpha = jnp.where(a["keep"], dalpha, 0.0)

            # straight-through alpha = opacity * G
            dpower = a["g_exp"] * a["op"] * dalpha        # [npix, chunk]

            # per-pair geometry grads via PIXEL MOMENTS: with
            # dx = gx - px separable, every reduction
            # sum_p dpower * poly(dx, dy) expands into combinations of
            # sum_p dpower * {1, px, py, px^2, py^2, px*py} — ONE tiny
            # [8, npix] @ [npix, chunk] matmul replaces ~10 full-plane
            # products + 6 plane reductions (the bwd kernel's VPU cost
            # dominated the step). The basis is hoisted out of the chunk
            # loop (and under power_mode="mxu" it is the SAME basis as the
            # power matmul, in the tile-centered frame). f32: px^2 reaches
            # ~1.4e6 (global) — bf16 would quantize it to ~2^-8 relative.
            mom = jax.lax.dot_general(
                basis, dpower, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [8, chunk]
            m0, mx, my = mom[0:1], mom[1:2], mom[2:3]
            mxx, myy, mxy = mom[3:4], mom[4:5], mom[5:6]
            gx, gy = a["gx"], a["gy"]
            sx_ = gx * m0 - mx                            # sum dpower*dx
            sy_ = gy * m0 - my
            ddx = -(a["ca"] * sx_) - a["cb"] * sy_
            ddy = -(a["cc"] * sy_) - a["cb"] * sx_
            da = -0.5 * (gx * gx * m0 - 2.0 * gx * mx + mxx)
            db = -(gx * gy * m0 - gx * my - gy * mx + mxy)
            dc = -0.5 * (gy * gy * m0 - 2.0 * gy * my + myy)
            # sum g_exp*dalpha == (sum dpower)/op (op constant per pair)
            d_opacity = jnp.where(a["op"] > 0.0, m0 / a["op"], 0.0)

            zeros = jnp.zeros((1, chunk), jnp.float32)
            dgeo_local = jnp.concatenate(
                [ddx, ddy, da, db, dc, d_opacity, zeros, zeros],
                axis=0)                                   # [8, chunk]
            dt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32
            dfeat_local = jax.lax.dot_general(
                w.astype(dt), gout.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [chunk, C]

            # read-modify-write accumulation (boundary windows overlap the
            # neighbouring tile's windows; sequential grid => race-free
            # within the DEFERRED-write discipline below).
            # The read was prefetched during chunk k-1's compute.
            wait_rd(base0, k)
            dgeo_buf[slot] = dgeo_buf[slot] + dgeo_local
            # bf16 store: adds stay f32 (a window is accumulated at most
            # twice — its own tile + a boundary-overlap neighbour)
            dfeat_buf[slot] = (dfeat_buf[slot].astype(jnp.float32)
                               + dfeat_local).astype(dfeat_buf.dtype)
            # DEFERRED write: start write k now, wait for it only one
            # iteration later (before read k+2 re-targets this slot) or at
            # the bucket drain. The synchronous wait paid ~2 DMA latencies
            # per chunk on the critical path; windows within a bucket are
            # disjoint, so ordering only matters across buckets — enforced
            # by the drain before the next bucket's first read.
            start_wr(base0, k)

            @pl.when(k + 1 < n_chunks)
            def _():
                # read k+1 targets slot (k+1)%2, whose last write was
                # chunk k-1 — wait for it (it has had chunk k's whole
                # compute phase to finish, so this is normally a no-op)
                @pl.when(k >= 1)
                def _():
                    wait_wr(base0, k - 1)
                start_rd(base0, k + 1)

            log_t_all = log_t_all + jnp.sum(log1m, axis=1, keepdims=True)
            s_prefix = s_prefix + jnp.sum(q, axis=1, keepdims=True)
            return k + 1, log_t_all, s_prefix

          def cond_b(carry):
            k, log_t_all, _ = carry
            return (k < n_chunks) & (jnp.max(log_t_all) >= LOG_TERM)

          k_fin, log_t_all, s_prefix = jax.lax.while_loop(
              cond_b, pass_b,
              (jnp.zeros((), jnp.int32), log_t_all0, s_prefix0))

          # early termination leaves fetch/read k_fin in flight — drain so
          # the semaphores are clean for the next bucket/grid step
          @pl.when(k_fin < n_chunks)
          def _():
              wait_fetch(base0, k_fin)
              wait_rd(base0, k_fin)

          # drain DEFERRED writes before the next bucket's first read (its
          # windows may overlap this bucket's): write k_fin-1 is always
          # pending; write k_fin-2 only on normal exhaustion (early exit
          # already waited it in the k_fin-1 iteration's read prologue —
          # a second wait on the semaphore would deadlock)
          @pl.when(k_fin >= 1)
          def _():
              wait_wr(base0, k_fin - 1)

          @pl.when((k_fin >= 2) & (k_fin == n_chunks))
          def _():
              wait_wr(base0, k_fin - 2)
          return b + 1, log_t_all, s_prefix

        def bcond_b(bcarry):
            b, log_t_all, _ = bcarry
            return (b < n_buckets) & (jnp.max(log_t_all) >= LOG_TERM)

        jax.lax.while_loop(
            bcond_b, bucket_b,
            (jnp.zeros((), jnp.int32), jnp.zeros((npix, 1), jnp.float32),
             jnp.zeros((npix, 1), jnp.float32)))

    pl.run_scoped(
        body,
        geo_buf=pltpu.VMEM((2, GEO_ROWS, chunk), jnp.float32),
        feat_buf=pltpu.VMEM((2, chunk, c_out), feats_hbm.dtype),
        dgeo_buf=pltpu.VMEM((2, GEO_ROWS, chunk), jnp.float32),
        dfeat_buf=pltpu.VMEM((2, chunk, c_out), dfeats_hbm.dtype),
        fsem=pltpu.SemaphoreType.DMA((2, 2)),
        rsem=pltpu.SemaphoreType.DMA((2, 2)),
        wsem=pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile_w", "tile_h", "ntx", "ntiles", "chunk",
                     "interpret", "n_buckets", "mm_dtype", "power_mode"))
def composite_backward_pallas(tile_start, tile_count, pair_geo, pair_feats,
                              gout, gtfin, tfin, acc, *, tile_w: int,
                              tile_h: int, ntx: int, ntiles: int,
                              chunk: int = 256, interpret: bool = False,
                              n_buckets: int = 1,
                              mm_dtype: str = "float32",
                              power_mode: str = "vpu"):
    """Run the backward kernel. gout/gtfin/tfin/acc are
    [ntiles, npix, C/1/1/C] (acc = the saved forward output, which equals
    the per-pixel weighted feature total needed for the suffix sums).
    Returns (dgeo [8, PAIRS], dfeats [PAIRS, C])."""
    pairs_pad = pair_geo.shape[1]
    c_out = pair_feats.shape[1]
    npix = tile_h * tile_w
    udt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32
    uexcl = jnp.triu(jnp.ones((chunk, chunk), udt), k=1)
    uincl = jnp.triu(jnp.ones((chunk, chunk), udt), k=0)

    kernel = functools.partial(
        _backward_kernel, chunk=chunk, tile_w=tile_w, tile_h=tile_h,
        ntx=ntx, c_out=c_out, pairs_pad=pairs_pad, n_buckets=n_buckets,
        mm_dtype=mm_dtype, power_mode=power_mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # geo
            pl.BlockSpec(memory_space=pltpu.HBM),   # feats
            pl.BlockSpec((1, npix, c_out), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # gout
            pl.BlockSpec((1, npix, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # gtfin
            pl.BlockSpec((1, npix, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # tfin
            pl.BlockSpec((1, npix, c_out), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # acc (forward output)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uexcl
            pl.BlockSpec(memory_space=pltpu.VMEM),  # uincl
            pl.BlockSpec(memory_space=pltpu.HBM),   # dgeo zeros (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),   # dfeats zeros (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # dgeo (manual RMW)
            pl.BlockSpec(memory_space=pltpu.HBM),   # dfeats (manual RMW)
        ],
    )
    dgeo0 = jnp.zeros((GEO_ROWS, pairs_pad), jnp.float32)
    # cotangent dtype must match the (possibly bf16) primal feats
    dfeats0 = jnp.zeros((pairs_pad, c_out), pair_feats.dtype)
    dgeo, dfeats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(dgeo0.shape, dgeo0.dtype),
            jax.ShapeDtypeStruct(dfeats0.shape, dfeats0.dtype),
        ],
        # the zeroed accumulators ride in as inputs aliased onto the
        # outputs (XLA emits a fused fill; zeroing inside the kernel cost
        # ~4k serial DMA round trips on the first grid step). Indices
        # count ALL operands including the two scalar-prefetch args.
        input_output_aliases={10: 0, 11: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(tile_start, tile_count, pair_geo, pair_feats, gout, gtfin, tfin,
      acc, uexcl, uincl, dgeo0, dfeats0)
    return dgeo, dfeats


@functools.lru_cache(maxsize=32)
def make_composite_vjp(tile_w: int, tile_h: int, ntx: int, ntiles: int,
                       chunk: int, interpret: bool, n_buckets: int = 1,
                       mm_dtype: str = "float32",
                       power_mode: str = "vpu", emit_kfin: bool = False):
    """Differentiable tile compositing: Pallas forward + Pallas backward.

    Returns f(start, count, geo, feats) -> (acc, tfin) with gradients
    flowing to geo/feats (pair space); the pair->gaussian reduction is the
    autodiff VJP of prepare_pairs' gathers. With emit_kfin the output is
    (acc, tfin, kfin) — kfin is the int32 per-tile termination watermark
    (no gradient; feeds ops/binning.trim_binning).
    """

    @jax.custom_vjp
    def f(start, count, geo, feats):
        return composite_tiles_pallas(
            start, count, geo, feats, tile_w=tile_w, tile_h=tile_h,
            ntx=ntx, ntiles=ntiles, chunk=chunk, interpret=interpret,
            n_buckets=n_buckets, mm_dtype=mm_dtype, power_mode=power_mode,
            emit_kfin=emit_kfin)

    def fwd(start, count, geo, feats):
        out = f(start, count, geo, feats)
        acc, tfin = out[0], out[1]
        return out, (start, count, geo, feats, tfin, acc)

    def bwd(res, cots):
        start, count, geo, feats, tfin, acc = res
        dacc, dtfin = cots[0], cots[1]  # kfin cotangent (int32) ignored
        dgeo, dfeats = composite_backward_pallas(
            start, count, geo, feats, dacc, dtfin, tfin, acc,
            tile_w=tile_w, tile_h=tile_h, ntx=ntx, ntiles=ntiles,
            chunk=chunk, interpret=interpret, n_buckets=n_buckets,
            mm_dtype=mm_dtype, power_mode=power_mode)
        zi = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
        return zi(start), zi(count), dgeo, dfeats

    f.defvjp(fwd, bwd)
    return f
