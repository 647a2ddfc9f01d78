"""Tile binning: depth ordering + (gaussian, tile) pair lists + tile ranges.

TPU-native replacement for the reference's duplicateWithKeys + CUB radix
sort + identifyTileRanges pipeline (cuda_rasterizer/rasterizer_impl.cu:
70-138, 280-320). Instead of 64-bit [tile|depth] keys we:

  1. sort gaussians once by view depth (stable argsort over P),
  2. emit per-gaussian (tile, depth-rank) pairs over a static tile-span cap,
     packed into a single int32 key = tile * P + rank (valid because
     ntiles * P < 2^31 for our capacities; asserted),
  3. sort the packed keys (invalid pairs get the sentinel ntiles * P and sink
     to the end),
  4. recover per-tile ranges with searchsorted.

Within a tile, ascending key order == ascending depth order, matching the
reference's sort semantics (rasterizer_impl.cu:98-109).

getRect parity (auxiliary.h:45-57): rect_min = clamp(floor((p - r)/TILE)),
rect_max = clamp(floor((p + r + TILE - 1)/TILE)); gaussians whose rect covers
zero tiles are culled (forward.cu:241-243).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.projection import Preprocessed


class TileRect(NamedTuple):
    x0: jnp.ndarray
    x1: jnp.ndarray
    y0: jnp.ndarray
    y1: jnp.ndarray


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray,
              tile_w: int, tile_h: int, ntx: int, nty: int) -> TileRect:
    px, py = mean2d[..., 0], mean2d[..., 1]
    r = radius.astype(px.dtype)
    x0 = jnp.clip(jnp.floor((px - r) / tile_w), 0, ntx).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((px + r + tile_w - 1) / tile_w), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((py - r) / tile_h), 0, nty).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((py + r + tile_h - 1) / tile_h), 0, nty).astype(jnp.int32)
    return TileRect(x0, x1, y0, y1)


def effective_radius(radius: jnp.ndarray, opacity: jnp.ndarray
                     ) -> jnp.ndarray:
    """Opacity-aware screen radius: the largest distance at which this
    gaussian can still clear the kernels' alpha >= ALPHA_MIN keep mask.

    alpha(d) = op * exp(-0.5 d^T C d) <= op * exp(-0.5 d^2 / lam_max)
    (lam_max = largest 2D-covariance eigenvalue), so alpha < ALPHA_MIN
    everywhere beyond r_eff = sqrt(lam_max) * sqrt(2 ln(op / ALPHA_MIN)).
    preprocess's radius = ceil(3 sqrt(lam_max)) gives sqrt(lam_max) <=
    radius / 3, hence the bound below is CONSERVATIVE: pairs culled with
    it contribute exactly zero in the compositing kernels (their keep
    mask zeroes both alpha and every gradient), so binning with r_eff is
    bit-exact vs the 3-sigma rect while emitting far fewer pairs at low
    opacity (the reference uses the fixed 3-sigma rect for every
    gaussian, forward.cu:226-243). Shrinks to 0 when op <= ALPHA_MIN."""
    from legslam_tpu.config import ALPHA_MIN
    ratio = jnp.log(jnp.maximum(opacity, 1e-12) / ALPHA_MIN)
    r = radius.astype(jnp.float32) / 3.0 * jnp.sqrt(
        2.0 * jnp.maximum(ratio, 0.0))
    # +1: tile_rect's far edge is floor((p + r + tile - 1)/tile), whose
    # excluded tiles only guarantee pixel distance > r - 1 — one pixel of
    # slack keeps every pixel with distance <= r_cull inside the rect
    # (the corner cull below prunes the admitted boundary tiles exactly).
    r = jnp.where(opacity > ALPHA_MIN, jnp.ceil(r) + 1.0, 0.0)
    # the RECT may clamp at the 3-sigma radius: the baseline rect is that
    # square, so pairs beyond it were never emitted anyway. The DISC cull
    # below must NOT clamp (see _cull_radius) — tile corners inside the
    # square can sit up to sqrt(2)*radius away and the kernels have no
    # 3-sigma cutoff.
    return jnp.minimum(r, radius.astype(jnp.float32)).astype(radius.dtype)


def _corner_cull(in_span, x0_tile, y0_tile, cull_cols_sorted,
                 tile_w: int, tile_h: int, msx: int, msy: int):
    """Drop candidate (gaussian, tile) pairs that cannot clear the
    compositing kernels' alpha >= ALPHA_MIN keep mask ANYWHERE in the
    tile: exact ANISOTROPIC test — minimize the conic quadratic form
    q(d) = 0.5*(ca dx^2 + cc dy^2) + cb dx dy (the kernels' -power) over
    the tile's pixel-center box and cull when op * exp(-q_min) <
    ALPHA_MIN. The isotropic circle bound this replaces (point-to-rect
    distance vs the lam_max support radius) keeps every corner tile an
    elongated gaussian's circumscribed circle touches but its ellipse
    does not — at mapping anisotropies that is a large fraction of all
    pairs. The box is padded 0.5 px and the threshold gets a relative
    slack so f32 ulp differences vs the kernels' own alpha chain cannot
    drop a contributing pair (conservative => the cull stays
    render-exact). Shapes: in_span [S, P] (S = msy*msx candidate slots,
    see _candidate_keys), x0_tile/y0_tile [P] (depth-ordered rect
    origins), cull_cols_sorted [P, 6] = (x, y, ca, cb, cc, thr) with
    thr = ln(op / ALPHA_MIN) (<= 0 means cull everywhere).

    LAYOUT: all the arithmetic runs as [S, P] with the BIG axis (P) in
    the 128-lane dim and the candidate slots in sublanes — the natural
    [P, msy, msx] orientation leaves 124/128 lanes idle (trailing axis
    4) and measured 2x the whole binning pipeline on v5e."""
    cs = cull_cols_sorted
    px, py = cs[:, 0], cs[:, 1]                       # [P]
    ca, cb, cc, thr = cs[:, 2], cs[:, 3], cs[:, 4], cs[:, 5]
    # tile pixel-center box in gaussian-centered coordinates, +0.5 slack
    oyy, oxx = jnp.meshgrid(jnp.arange(msy, dtype=jnp.float32),
                            jnp.arange(msx, dtype=jnp.float32),
                            indexing="ij")
    off_x = (oxx.reshape(-1, 1)) * tile_w             # [S, 1]
    off_y = (oyy.reshape(-1, 1)) * tile_h
    gx = x0_tile.astype(jnp.float32) * tile_w - px - 0.5   # [P]
    gy = y0_tile.astype(jnp.float32) * tile_h - py - 0.5
    x0 = gx[None, :] + off_x                          # [S, P]
    x1 = x0 + (tile_w - 1) + 1.0
    y0 = gy[None, :] + off_y
    y1 = y0 + (tile_h - 1) + 1.0
    ca_, cb_, cc_ = ca[None, :], cb[None, :], cc[None, :]

    def q(dx, dy):
        return 0.5 * (ca_ * dx * dx + cc_ * dy * dy) + cb_ * dx * dy

    # conic diagonals are > 0 for every valid gaussian (det>0 + lowpass);
    # guard anyway so culled/invalid lanes stay finite
    inv_ca = (1.0 / jnp.maximum(ca, 1e-12))[None, :]
    inv_cc = (1.0 / jnp.maximum(cc, 1e-12))[None, :]
    # exact min over the box: 0 if the center is inside, else the least
    # of the four edge minima (PSD quadratic => the constrained min lies
    # on the boundary when the unconstrained min is outside)
    yx0 = jnp.clip(-cb_ * x0 * inv_cc, y0, y1)
    yx1 = jnp.clip(-cb_ * x1 * inv_cc, y0, y1)
    xy0 = jnp.clip(-cb_ * y0 * inv_ca, x0, x1)
    xy1 = jnp.clip(-cb_ * y1 * inv_ca, x0, x1)
    q_min = jnp.minimum(
        jnp.minimum(q(x0, yx0), q(x1, yx1)),
        jnp.minimum(q(xy0, y0), q(xy1, y1)))
    inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
    q_min = jnp.where(inside, 0.0, q_min)
    # relative + absolute slack on the threshold comparison (the kernels
    # evaluate the same form in their own f32 op order)
    keep = (q_min <= thr[None, :] * (1.0 + 1e-4) + 1e-5) & \
        (thr[None, :] > 0.0)                          # [S, P]
    return in_span & keep


def _candidate_keys(x0, y0, sx, sy, v, ntx: int, P: int,
                    msx: int, msy: int):
    """[S, P] candidate construction (S = msy*msx static span slots,
    row-major (sy, sx)): tile id + in-span mask per (slot, gaussian).
    Same [S, P] layout rationale as _corner_cull — the 128-lane dim
    carries P. Inputs are depth-ordered [P] rect origins/spans/valid."""
    oyy, oxx = jnp.meshgrid(jnp.arange(msy, dtype=jnp.int32),
                            jnp.arange(msx, dtype=jnp.int32),
                            indexing="ij")
    ox = oxx.reshape(-1, 1)                            # [S, 1]
    oy = oyy.reshape(-1, 1)
    tx = x0[None, :] + ox                              # [S, P]
    ty = y0[None, :] + oy
    in_span = (ox < sx[None, :]) & (oy < sy[None, :]) & v[None, :]
    return ty * ntx + tx, in_span


def _slab_combos(msy: int, msx: int) -> list[tuple[int, int]]:
    """Ladder of (ky, kx) span-slot subgrids, each containing the last,
    ending at the full (msy, msx) grid. bin_gaussians lax.switches over
    these: the smallest subgrid covering every valid gaussian's clamped
    span carries ALL non-sentinel candidates, so the candidate pipeline
    (tile ids + corner cull + key sort) runs on ky*kx rows instead of
    msy*msx. A converged mapping store (20 px prune bound) spans <= 4x2
    tiles at 16x128, so the common case sorts 4x fewer keys."""
    combos = [(1, 1)]
    ky, kx = 1, 1
    ratio = max(msy // max(msx, 1), 1)
    while (ky, kx) != (msy, msx):
        if ky < msy and (ky < kx * ratio or kx == msx):
            ky = min(ky * 2, msy)
        else:
            kx = min(kx * 2, msx)
        combos.append((ky, kx))
    # full-height column variants: a handful of span-y outliers (tile
    # straddle at the prune bound) must not force the full grid when the
    # x-span stays narrow — measured 0.6% of a steady-state store at
    # span_y 5 doubling the sort without these
    k = 1
    while k < msx:
        combos.append((msy, k))
        k *= 2
    return sorted(set(combos), key=lambda c: (c[0] * c[1], c[0]))


def _cull_cols(pre: Preprocessed, opacity: jnp.ndarray) -> jnp.ndarray:
    """[P, 6] packed columns for _corner_cull (one fused row gather when
    reordered by depth instead of three separate [P, small] gathers)."""
    from legslam_tpu.config import ALPHA_MIN
    thr = jnp.log(jnp.maximum(opacity, 1e-12) / ALPHA_MIN)
    return jnp.stack(
        [pre.mean2d[:, 0], pre.mean2d[:, 1], pre.conic[:, 0],
         pre.conic[:, 1], pre.conic[:, 2], thr], axis=1)


class Binning(NamedTuple):
    order: jnp.ndarray        # [P] gaussian ids in ascending depth
    pair_gid: jnp.ndarray     # [NPAIR] gaussian id per sorted pair
    tile_start: jnp.ndarray   # [ntiles] range start into pair arrays
    tile_count: jnp.ndarray   # [ntiles] pairs per tile
    num_rendered: jnp.ndarray # [] total valid pairs
    span_overflow: jnp.ndarray  # [] pairs lost to the static tile-span cap


class BucketedBinning(NamedTuple):
    """Rank-block bucketed binning: gaussians are depth-sorted, the rank
    axis is split into B contiguous blocks, and each block's (tile, rank)
    pairs are sorted INDEPENDENTLY (XLA's batched sort is ~3x faster than
    one flat sort at this size). Because blocks partition the depth order,
    visiting buckets 0..B-1 per tile preserves exact front-to-back order.
    """
    order: jnp.ndarray        # [P] gaussian ids in ascending depth
    pair_gid: jnp.ndarray     # [B * cap_b] gaussian ids, bucket-major
    tile_start: jnp.ndarray   # [ntiles, B] starts into the flat pair axis
    tile_count: jnp.ndarray   # [ntiles, B]
    num_rendered: jnp.ndarray # [] total valid pairs (pre-truncation)
    overflow: jnp.ndarray     # [] pairs lost to per-bucket caps
    span_overflow: jnp.ndarray  # [] pairs lost to the static tile-span cap


def bin_gaussians(pre: Preprocessed, width: int, height: int,
                  cfg: RasterizeConfig,
                  opacity: jnp.ndarray | None = None) -> Binning:
    P = pre.mean2d.shape[0]
    ntx = -(-width // cfg.tile_w)
    nty = -(-height // cfg.tile_h)
    ntiles = ntx * nty
    if ntiles * (P + 1) >= 2 ** 31:
        raise ValueError(
            f"packed binning key overflow: ntiles={ntiles} P={P}; "
            "reduce capacity or enlarge tiles")

    use_pallas_sort = getattr(cfg, "pallas_sort", False)
    if use_pallas_sort:
        from legslam_tpu.ops.pallas.sort import argsort_f32
        order = argsort_f32(pre.depth, pre.mask,
                            interpret=cfg.pallas_interpret)[:P]
    else:
        depth_key = jnp.where(pre.mask, pre.depth, jnp.inf)
        order = jnp.argsort(depth_key)  # stable

    r_bin = pre.radius if opacity is None else \
        effective_radius(pre.radius, opacity)
    rect = tile_rect(pre.mean2d, r_bin, cfg.tile_w, cfg.tile_h, ntx, nty)
    span_x = rect.x1 - rect.x0
    span_y = rect.y1 - rect.y0
    valid = pre.mask & (span_x * span_y > 0)

    # emit pairs over the static span cap, then sort the whole emission
    # buffer (P * span, ~90% sentinels). Compact-before-sort was tried
    # twice and measured WORSE on this stack: an 8M-element scatter
    # compaction ran 1.4 s, and a gather/jnp.repeat enumeration of the
    # first max_pairs valid pairs ran 124 ms vs the 95 ms flat sort
    # (scalar 1M-gathers from 256k tables are pathologically slow here).
    # The flat sort stays; callers amortize it via the per-view binning
    # cache (mapper binning_refresh_interval).
    #
    # The candidate pipeline runs in ORIGINAL gaussian order with the
    # depth rank looked up per gaussian (rank_of = inverse permutation,
    # ONE [P] scatter) instead of gathering rect/span/cull columns into
    # depth order (SIX row-rate-bound [P] gathers, measured 13.6 ms of a
    # 44 ms binning at bench scale). The emitted key SET is identical —
    # keys encode (tile, rank) regardless of emission order — so the
    # sorted output is bit-identical.
    msx, msy = cfg.max_span_x, cfg.max_span_y
    S = msy * msx
    sentinel = ntiles * P
    x0, y0 = rect.x0, rect.y0
    sx, sy, v = span_x, span_y, valid
    rank_of = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32), unique_indices=True)
    cull = opacity is not None and getattr(cfg, "ellipse_cull", True)
    cull_cols = _cull_cols(pre, opacity) if cull else None

    def emit(ky: int, kx: int):
        """Candidate keys + cull + sort over the (ky, kx) span-slot
        subgrid; [ky*kx*P] sorted keys and the valid-pair count."""
        tid, isp = _candidate_keys(x0, y0, sx, sy, v, ntx, P, kx, ky)
        if cull:
            isp = _corner_cull(isp, x0, y0, cull_cols,
                               cfg.tile_w, cfg.tile_h, kx, ky)
        # element order before the FULL sort is irrelevant, so the [S, P]
        # emission buffer flattens without any transpose back to
        # pair-major
        key = jnp.where(isp, tid * P + rank_of[None, :],
                        sentinel).reshape(-1)
        return jnp.sort(key), jnp.sum(isp.astype(jnp.int32))

    if use_pallas_sort:
        import numpy as np
        from legslam_tpu.ops.pallas.sort import INT32_MAX, sort_keys
        tid, in_span = _candidate_keys(x0, y0, sx, sy, v, ntx, P, msx, msy)
        if cull:
            in_span = _corner_cull(in_span, x0, y0, cull_cols,
                                   cfg.tile_w, cfg.tile_h, msx, msy)
        key = jnp.where(in_span, tid * P + rank_of[None, :],
                        sentinel).reshape(-1)
        n = key.shape[0]
        n_pad = 1 << int(np.ceil(np.log2(max(n, 256))))
        key_padded = jnp.pad(key, (0, n_pad - n),
                             constant_values=int(INT32_MAX))
        key_sorted = sort_keys(key_padded,
                               interpret=cfg.pallas_interpret)[:n]
        num_valid = jnp.sum(in_span.astype(jnp.int32))
    else:
        # span-slab prefix (same trick as the backward scatter's
        # slab-skip): switch to the smallest static subgrid of span
        # slots that covers every valid gaussian's clamped span — the
        # discarded slot rows are provably all-sentinel (row (oy, ox)
        # holds a pair only when oy < min(sy, msy) and ox < min(sx,
        # msx)), so the prefix sort is EXACT while sorting k*P keys
        # instead of S*P
        combos = _slab_combos(msy, msx)
        ky_need = jnp.max(jnp.where(v, jnp.minimum(sy, msy), 0))
        kx_need = jnp.max(jnp.where(v, jnp.minimum(sx, msx), 0))
        covered = jnp.stack(
            [(ky_need <= ky) & (kx_need <= kx) for ky, kx in combos])
        # first (smallest-area) covering combo; the last always covers
        idx = jnp.argmax(covered).astype(jnp.int32)

        def make_branch(ky, kx):
            def f(_):
                ks, nv = emit(ky, kx)
                pad = (S - ky * kx) * P
                if pad:
                    ks = jnp.concatenate(
                        [ks, jnp.full((pad,), sentinel, jnp.int32)])
                return ks, nv
            return f

        key_sorted, num_valid = jax.lax.switch(
            idx, [make_branch(ky, kx) for ky, kx in combos],
            jnp.int32(0))
    # pairs a gaussian would emit beyond the static span cap (the reference
    # never drops pairs — rasterizer_impl.cu:280-320 sizes buffers to
    # num_rendered — so we count what the cap costs us)
    span_overflow = jnp.sum(jnp.where(
        v, sx * sy - jnp.minimum(sx, msx) * jnp.minimum(sy, msy), 0
    ).astype(jnp.int32))
    # the pallas path only ever consumes the first max_pairs sorted entries
    # (prepare_pairs truncation) — slicing BEFORE the id gather cuts an
    # 8x-oversized scalar gather (the emission buffer is P*span entries,
    # mostly sentinels) that measured ~60 ms at bench scale. The xla
    # backend indexes the full range per tile, so it keeps every entry.
    npair = key_sorted.shape[0]
    keep = min(cfg.max_pairs, npair) if cfg.backend == "pallas" else npair
    kk = key_sorted[:keep]
    pair_rank = kk % P
    # sentinel pairs get gid = P (out of range): the pair-feature gather
    # clamps harmlessly (the kernel's in_range mask never reads them), and
    # the backward scatter-add DROPS them — with gid 0 every sentinel pair
    # collided on the same row (sentinel % P == 0), serializing up to
    # hundreds of thousands of zero-adds in the TPU scatter.
    # Chunked lookup with cond-skip (same trick as _chunked_take_raw):
    # valid keys occupy the sorted prefix, so chunks starting past
    # num_valid are all-sentinel and skip the row-rate-bound gather.
    n_chunks = 64 if keep % 64 == 0 else 1
    rows = keep // n_chunks

    def _one(args):
        pr, active = args
        return jax.lax.cond(active, lambda: order[pr],
                            lambda: jnp.full((rows,), P, jnp.int32))

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * rows
    gid = jax.lax.map(_one, (pair_rank.reshape(n_chunks, rows),
                             starts < num_valid)).reshape(keep)
    pair_gid = jnp.where(kk < ntiles * P, gid, P)

    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * P
    edges = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
    tile_start = edges[:-1]
    tile_count = edges[1:] - edges[:-1]
    return Binning(order=order, pair_gid=pair_gid, tile_start=tile_start,
                   tile_count=tile_count, num_rendered=num_valid,
                   span_overflow=span_overflow)


def trim_binning(binning: Binning, kfin: jnp.ndarray, max_pairs: int,
                 chunk: int, slack_chunks: int = 1) -> Binning:
    """Termination-aware trim of a cached flat binning.

    `kfin` ([ntiles] int32) is the forward kernel's per-tile termination
    watermark (chunks processed before every pixel crossed T < 1e-4,
    forward.cu:353-357 semantics) from a step that ran with THIS binning.
    Pairs past the watermark contributed exactly zero color and received
    exactly zero gradient in that step — the compositing kernels never
    read them — but the row-rate-bound pair gather/scatter engine still
    paid for them (they sit inside the global valid prefix). This trims
    each tile's range at the watermark (+`slack_chunks` of headroom for
    within-refresh-group drift) and COMPACTS the survivors to a global
    prefix, so the existing nvalid-based chunk-skip (gather) and slab-skip
    (scatter) machinery drops the dead rows.

    Same staleness class as the binning cache itself (the store drifts
    between a refresh and its reuse steps; mapper binning_refresh_interval
    gates both): at the state the watermark was measured, the trimmed
    render composites the IDENTICAL contributing-pair set — outputs and
    gradients agree up to f32 reassociation of the chunked transmittance
    prefix (compaction shifts tile starts relative to chunk boundaries).

    The compaction is sort-free: survivors are per-tile PREFIXES of
    contiguous ranges, so the source index is pos + a per-segment constant
    offset (start[t] - start_new[t]) — a step function over positions,
    materialized by ONE tiny [ntiles]-point scatter-add of the offset
    jumps at the new segment starts + a cumsum (a searchsorted here would
    be ~10 rounds of [npair] scalar gathers from the [ntiles] table — the
    pathological TPU pattern), then one chunk-skipped row gather.
    """
    P = binning.order.shape[0]
    npair = binning.pair_gid.shape[0]
    # the clipped frame prepare_pairs actually used
    start = jnp.minimum(binning.tile_start, max_pairs).astype(jnp.int32)
    end = jnp.minimum(binning.tile_start + binning.tile_count,
                      max_pairs).astype(jnp.int32)
    count = end - start
    base0 = (start // chunk) * chunk
    live_end = jnp.minimum(
        start + count, base0 + (kfin + slack_chunks) * chunk)
    count_new = jnp.maximum(live_end - start, 0).astype(jnp.int32)
    cum = jnp.cumsum(count_new)
    start_new = (cum - count_new).astype(jnp.int32)
    live_total = cum[-1].astype(jnp.int32)

    pos = jnp.arange(npair, dtype=jnp.int32)
    # src = pos + offset[t_of(pos)] with offset = start - start_new
    # constant within each destination segment: scatter each segment's
    # offset JUMP at its start position (zero-count segments share a
    # start; add-mode accumulates their net jump) and cumsum into the
    # per-position step function. Positions >= live_total get garbage —
    # masked to the sentinel below.
    offset = start - start_new
    jump = jnp.diff(offset, prepend=offset[:1])
    jump = jump.at[0].set(offset[0])
    off = jnp.zeros(npair, jnp.int32).at[start_new].add(jump, mode="drop")
    src = pos + jnp.cumsum(off)
    src = jnp.clip(src, 0, npair - 1)

    # chunk-skipped 1-D gather: positions >= live_total are sentinels
    n_chunks = 64 if npair % 64 == 0 else 1
    rows = npair // n_chunks

    def one(args):
        ix, active = args
        return jax.lax.cond(active, lambda: binning.pair_gid[ix],
                            lambda: jnp.full((rows,), P, jnp.int32))

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * rows
    gid = jax.lax.map(one, (src.reshape(n_chunks, rows),
                            starts < live_total)).reshape(npair)
    gid = jnp.where(pos < live_total, gid, P)
    return Binning(order=binning.order, pair_gid=gid,
                   tile_start=start_new, tile_count=count_new,
                   num_rendered=live_total,
                   span_overflow=binning.span_overflow)


def bin_gaussians_bucketed(pre: Preprocessed, width: int, height: int,
                           cfg: RasterizeConfig, n_buckets: int,
                           cap_per_bucket: int,
                           opacity: jnp.ndarray | None = None
                           ) -> BucketedBinning:
    """Bucketed variant of bin_gaussians (see BucketedBinning).

    P must be divisible by n_buckets; each bucket keeps its first
    cap_per_bucket sorted pairs (valid pairs sort before sentinels, so
    truncation only drops overflow, which is counted).
    """
    P = pre.mean2d.shape[0]
    assert P % n_buckets == 0, (P, n_buckets)
    assert cap_per_bucket % 256 == 0, cap_per_bucket  # chunk-aligned regions
    ntx = -(-width // cfg.tile_w)
    nty = -(-height // cfg.tile_h)
    ntiles = ntx * nty
    if ntiles * (P + 1) >= 2 ** 31:
        raise ValueError("packed binning key overflow")

    if getattr(cfg, "pallas_sort", False):
        from legslam_tpu.ops.pallas.sort import argsort_f32
        order = argsort_f32(pre.depth, pre.mask,
                            interpret=cfg.pallas_interpret)[:P]
    else:
        depth_key = jnp.where(pre.mask, pre.depth, jnp.inf)
        order = jnp.argsort(depth_key)

    r_bin = pre.radius if opacity is None else \
        effective_radius(pre.radius, opacity)
    rect = tile_rect(pre.mean2d, r_bin, cfg.tile_w, cfg.tile_h, ntx, nty)
    span_x = rect.x1 - rect.x0
    span_y = rect.y1 - rect.y0
    valid = pre.mask & (span_x * span_y > 0)

    x0 = rect.x0[order]
    y0 = rect.y0[order]
    sx = span_x[order]
    sy = span_y[order]
    v = valid[order]

    msx, msy = cfg.max_span_x, cfg.max_span_y
    tid, in_span = _candidate_keys(x0, y0, sx, sy, v, ntx, P, msx, msy)
    if opacity is not None and getattr(cfg, "ellipse_cull", True):
        in_span = _corner_cull(
            in_span, x0, y0, _cull_cols(pre, opacity)[order],
            cfg.tile_w, cfg.tile_h, msx, msy)
    rank = jnp.arange(P, dtype=jnp.int32)
    key = jnp.where(in_span, tid * P + rank[None, :], ntiles * P)

    # bucket rows = contiguous rank blocks; intra-bucket order before the
    # per-row sort is irrelevant, so the [S, P] buffer regroups with a
    # cheap block swap (contiguous P/B-lane runs) instead of a transpose
    rows = key.reshape(msy * msx, n_buckets, -1).swapaxes(0, 1) \
        .reshape(n_buckets, -1)
    rows_sorted = jnp.sort(rows, axis=-1)
    kept = rows_sorted[:, :cap_per_bucket]               # [B, cap_b]

    num_valid = jnp.sum(in_span.astype(jnp.int32))
    sentinel = ntiles * P
    kept_valid = jnp.sum((kept < sentinel).astype(jnp.int32))
    overflow = num_valid - kept_valid
    span_overflow = jnp.sum(jnp.where(
        v, sx * sy - jnp.minimum(sx, msx) * jnp.minimum(sy, msy), 0
    ).astype(jnp.int32))

    kflat = kept.reshape(-1)
    pair_rank = kflat % P
    # sentinel pairs -> gid P (see bin_gaussians: gather clamps, scatter
    # drops; avoids the all-sentinels-collide-on-row-0 scatter hotspot)
    pair_gid = jnp.where(kflat < sentinel, order[pair_rank], P)

    # per-bucket tile ranges; flat offsets add b * cap_b
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * P
    edges = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left"))(kept)
    edges = edges.astype(jnp.int32)                       # [B, ntiles+1]
    base = (jnp.arange(n_buckets, dtype=jnp.int32) *
            cap_per_bucket)[:, None]
    tile_start = (edges[:, :-1] + base).T                 # [ntiles, B]
    tile_count = (edges[:, 1:] - edges[:, :-1]).T
    return BucketedBinning(order=order, pair_gid=pair_gid,
                           tile_start=tile_start, tile_count=tile_count,
                           num_rendered=num_valid, overflow=overflow,
                           span_overflow=span_overflow)
