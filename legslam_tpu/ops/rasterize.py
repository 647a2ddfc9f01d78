"""Tiled differentiable rasterizer — the production render path.

TPU-native equivalent of the reference render stack (C1-C4 in SURVEY.md §2):
GaussianRenderer::render (src/gaussian_renderer.cpp:23-161) →
Rasterizer::forward (cuda_rasterizer/rasterizer_impl.cu:198-343). The CUDA
design (per-tile thread blocks, sequential front-to-back blending, atomicAdd
backward) is replaced by:

  * vectorized preprocess over the capacity-padded gaussian axis,
  * packed-key sort binning (ops/binning.py),
  * per-tile chunked compositing where blend weights come from an exclusive
    cumprod and channel reduction is a [npix, chunk] x [chunk, C] MXU matmul
    (ops/composite.py), scanned over depth chunks with a transmittance carry,
  * JAX autodiff through the whole thing (gradient contract parity notes in
    ops/composite.py), with hierarchical rematerialization to keep backward
    memory at O(carries) instead of O(all alphas).

RGB(3) + language features(64) + view depth(1) are composited in one fused
feature matrix, like the reference's single kernel handling all three
(forward.cu:261-392).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import (Binning, bin_gaussians,
    bin_gaussians_bucketed)
from legslam_tpu.ops.composite import blend_weights, masked_alpha
from legslam_tpu.ops.projection import Preprocessed, preprocess
from legslam_tpu.ops.slabs import prefix_map, watermark
from legslam_tpu.utils.camera import CameraView
from legslam_tpu.utils.sh import sh_to_color
from legslam_tpu.utils.transforms import normalize_quat


def _pre_skip_out(n: int, extra_cols: int | None = None):
    """Inert Preprocessed rows for watermark-skipped slabs: mask False and
    radius 0 exclude them from binning/stats; mean2d -1e6 with a unit
    conic is defense-in-depth (any accidental consumer sees power ~ -1e12,
    alpha 0). Matches what live code produces for culled rows downstream.
    """
    pre = Preprocessed(
        mean2d=jnp.full((n, 2), -1e6, jnp.float32),
        conic=jnp.tile(jnp.asarray([[1.0, 0.0, 1.0]], jnp.float32), (n, 1)),
        depth=jnp.zeros((n,), jnp.float32),
        radius=jnp.zeros((n,), jnp.int32),
        mask=jnp.zeros((n,), bool))
    if extra_cols is None:
        return pre
    return pre, jnp.zeros((n, extra_cols), jnp.float32)


class RasterizeOutput(NamedTuple):
    color: jnp.ndarray             # [H, W, 3]
    lang_feat: jnp.ndarray | None  # [H, W, LF]
    depth: jnp.ndarray             # [H, W]
    final_t: jnp.ndarray           # [H, W]
    radii: jnp.ndarray             # [P] int32
    num_rendered: jnp.ndarray      # [] int32 valid pairs
    # pairs dropped by ANY static cap (span clip, max_pairs truncation,
    # per-tile/bucket caps). The reference never drops pairs
    # (rasterizer_impl.cu sizes buffers to num_rendered); nonzero means
    # far gaussians silently lose coverage + gradient — callers should warn.
    overflow_pairs: jnp.ndarray    # [] int32
    # per-tile termination watermark (chunks processed before T<1e-4;
    # pallas backend with emit_kfin only) — feeds binning.trim_binning
    kfin: jnp.ndarray | None = None  # [ntiles] int32


def _composite_tiles(binning: Binning, mean2d: jnp.ndarray,
                     conic: jnp.ndarray, opacity: jnp.ndarray,
                     feats: jnp.ndarray, width: int, height: int,
                     cfg: RasterizeConfig, max_per_tile: int):
    """Composite all tiles; returns ([nty*TH, ntx*TW, C], final_t)."""
    P = mean2d.shape[0]
    C = feats.shape[-1]
    TW, TH = cfg.tile_w, cfg.tile_h
    ntx = -(-width // TW)
    nty = -(-height // TH)
    ntiles = ntx * nty
    npix = TH * TW
    chunk = cfg.chunk
    n_chunks = -(-max_per_tile // chunk)
    npair = binning.pair_gid.shape[0]

    xs = jnp.arange(TW, dtype=jnp.float32)
    ys = jnp.arange(TH, dtype=jnp.float32)
    koff = jnp.arange(chunk, dtype=jnp.int32)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def batch_fn(tile_ids):
        B = tile_ids.shape[0]
        start = binning.tile_start[tile_ids]
        count = jnp.minimum(binning.tile_count[tile_ids], max_per_tile)
        tx0 = (tile_ids % ntx).astype(jnp.float32) * TW
        ty0 = (tile_ids // ntx).astype(jnp.float32) * TH
        px = tx0[:, None] + xs[None, :]            # [B, TW]
        py = ty0[:, None] + ys[None, :]            # [B, TH]

        @functools.partial(jax.checkpoint, prevent_cse=False)
        def chunk_step(carry, k):
            t_all, t_fin, acc = carry
            pos = k * chunk + koff[None, :]                    # [B, chunk]
            pvalid = pos < count[:, None]
            idx = jnp.clip(start[:, None] + pos, 0, npair - 1)
            gid = binning.pair_gid[idx]                        # [B, chunk]
            m2 = mean2d[gid]                                   # [B, chunk, 2]
            con = conic[gid]
            op = opacity[gid]
            f = feats[gid]                                     # [B, chunk, C]

            dx = m2[..., 0][:, None, None, :] - px[:, None, :, None]
            dy = m2[..., 1][:, None, None, :] - py[:, :, None, None]
            a = con[..., 0][:, None, None, :]
            b = con[..., 1][:, None, None, :]
            c = con[..., 2][:, None, None, :]
            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
            alpha = masked_alpha(power, op[:, None, None, :],
                                 extra_mask=pvalid[:, None, None, :])
            alpha = alpha.reshape(B, npix, chunk)
            w, t_all_out, t_fin_delta = blend_weights(alpha, t_all)
            # HIGHEST precision: the blend reduction accumulates many small
            # contributions; default (bf16-input) MXU passes cost ~1e-3
            # relative error, which is visible in PSNR.
            acc = acc + jnp.einsum("bpk,bkc->bpc", w, f,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
            return (t_all_out, t_fin * t_fin_delta, acc), None

        init = (jnp.ones((B, npix), jnp.float32),
                jnp.ones((B, npix), jnp.float32),
                jnp.zeros((B, npix, C), jnp.float32))
        (_, t_final, acc), _ = jax.lax.scan(
            chunk_step, init, jnp.arange(n_chunks, dtype=jnp.int32))
        return acc.reshape(B, TH, TW, C), t_final.reshape(B, TH, TW)

    tb = cfg.tile_batch
    n_batches = -(-ntiles // tb)
    pad_tiles = n_batches * tb
    tile_ids = jnp.arange(pad_tiles, dtype=jnp.int32).clip(0, ntiles - 1)
    tiles, t_fin = jax.lax.map(batch_fn, tile_ids.reshape(n_batches, tb))

    tiles = tiles.reshape(pad_tiles, TH, TW, C)[:ntiles]
    t_fin = t_fin.reshape(pad_tiles, TH, TW)[:ntiles]
    img = tiles.reshape(nty, ntx, TH, TW, C).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * TH, ntx * TW, C)[:height, :width]
    tf = t_fin.reshape(nty, ntx, TH, TW).transpose(0, 2, 1, 3)
    tf = tf.reshape(nty * TH, ntx * TW)[:height, :width]
    return img, tf


def _apply_crop(pre: Preprocessed, crop_y, crop_h: int | None,
                height: int):
    """Shift screen-space means down to a pixel-row strip's local frame
    and return the strip height. One shared definition: the cached
    spatial binning (compute_binning) and the in-step fresh binning
    (render_arrays) must agree on the shift convention exactly."""
    if crop_y is None:
        return pre, height
    shift = jnp.stack([jnp.zeros_like(jnp.float32(crop_y)),
                       jnp.float32(crop_y)])
    return pre._replace(mean2d=pre.mean2d - shift[None, :]), crop_h


def make_binning(pre: Preprocessed, width: int, height: int,
                 cfg: RasterizeConfig, max_per_tile: int,
                 opacity: jnp.ndarray | None = None):
    """Bin preprocessed gaussians; returns (binning, overflow_pairs). This
    is the sort-dominated half of the prep pipeline
    (duplicateWithKeys + radix sort + identifyTileRanges,
    rasterizer_impl.cu:280-320) — it depends only on geometry
    (mean2d/radius/depth/valid), carries no gradients, and so may be
    cached across iterations of the same view (mapper
    binning_refresh_interval). Passing `opacity` (activated, [P]) enables
    the exact opacity-aware pair cull (binning.effective_radius): pairs
    that cannot clear the compositors' alpha >= ALPHA_MIN keep mask are
    never emitted."""
    if opacity is not None:
        opacity = jax.lax.stop_gradient(opacity)
    if cfg.backend == "pallas":
        nb = getattr(cfg, "n_buckets", 1)
        if nb > 1:
            binning = bin_gaussians_bucketed(
                pre, width, height, cfg, nb, cfg.bucket_cap,
                opacity=opacity)
            overflow = binning.span_overflow + binning.overflow
        else:
            binning = bin_gaussians(pre, width, height, cfg,
                                    opacity=opacity)
            overflow = binning.span_overflow + jnp.maximum(
                binning.num_rendered - cfg.max_pairs, 0)
    else:
        binning = bin_gaussians(pre, width, height, cfg, opacity=opacity)
        overflow = binning.span_overflow + jnp.sum(
            jnp.maximum(binning.tile_count - max_per_tile, 0))
    return binning, overflow.astype(jnp.int32)


def compute_binning(means3d: jnp.ndarray, scales: jnp.ndarray,
                    quats: jnp.ndarray, valid: jnp.ndarray,
                    world_view: jnp.ndarray, full_proj: jnp.ndarray,
                    tan_fovx, tan_fovy, width: int, height: int,
                    cfg: RasterizeConfig, max_per_tile: int = 2048,
                    scale_modifier: float = 1.0,
                    opacity: jnp.ndarray | None = None,
                    crop_y: jnp.ndarray | None = None,
                    crop_h: int | None = None):
    """Standalone binning for callers that cache it (activated scales +
    activated opacity expected, like render_arrays). crop_y/crop_h bin only
    the pixel-row strip [crop_y, crop_y+crop_h) — see render_arrays."""
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    def run_pre(a):
        return preprocess(
            a["xyz"], a["scales"], normalize_quat(a["quats"]), a["valid"],
            world_view, full_proj, width, height, focal_x, focal_y,
            tan_fovx, tan_fovy, scale_modifier)

    args = dict(xyz=means3d, scales=scales, quats=quats, valid=valid)
    ps = getattr(cfg, "p_slabs", 0)
    if ps and means3d.shape[0] % ps == 0:
        pre = prefix_map(run_pre,
                         lambda a: _pre_skip_out(a["valid"].shape[0]),
                         args, watermark(valid), ps)
    else:
        pre = run_pre(args)
    pre, height = _apply_crop(pre, crop_y, crop_h, height)
    return make_binning(pre, width, height, cfg, max_per_tile,
                        opacity=opacity)


def render_arrays(means3d: jnp.ndarray, sh: jnp.ndarray,
                  lang_feat: jnp.ndarray, opacity: jnp.ndarray,
                  scales: jnp.ndarray, quats: jnp.ndarray,
                  valid: jnp.ndarray, world_view: jnp.ndarray,
                  full_proj: jnp.ndarray, cam_center: jnp.ndarray,
                  tan_fovx, tan_fovy, width: int, height: int,
                  bg: jnp.ndarray, active_sh_degree: int,
                  cfg: RasterizeConfig,
                  include_lang_feat: bool = True,
                  scale_modifier: float = 1.0,
                  mean2d_offset: jnp.ndarray | None = None,
                  max_per_tile: int = 2048,
                  colors_precomp: jnp.ndarray | None = None,
                  stop_depth_grad: bool = True,
                  binning=None,
                  crop_y: jnp.ndarray | None = None,
                  crop_h: int | None = None,
                  emit_kfin: bool = False) -> RasterizeOutput:
    """Core render on raw arrays (jit/grad-friendly: width/height static,
    everything else traceable). See `rasterize` for argument docs.

    crop_y/crop_h render only the pixel-row strip [crop_y, crop_y+crop_h)
    of the FULL image (projection, EWA clamp and focal all stay full-image
    exact; only binning + compositing shrink to the strip). crop_y is
    traceable (it may be `lax.axis_index`-derived inside shard_map — the
    spatial tile-sharding path, parallel/spatial.py), crop_h is static and
    should be a tile_h multiple. Output arrays are [crop_h, W]. Strip
    renders are exact vs the matching rows of the full render whenever the
    full render reports span_overflow == 0 (a strip clamps a gaussian's
    tile rect at the strip edge, so the static span cap truncates less)."""
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    n_feat = 3 + (lang_feat.shape[-1] if include_lang_feat else 0) + 1

    def pre_feats(a):
        """Rowwise per-gaussian prologue: preprocess + SH eval + the fused
        feature matrix. One region so the watermark slab-skip (cfg.p_slabs)
        covers every P-bound op in a single lax.map pass."""
        pre = preprocess(
            a["xyz"], a["scales"], normalize_quat(a["quats"]), a["valid"],
            world_view, full_proj, width, height, focal_x, focal_y,
            tan_fovx, tan_fovy, scale_modifier)
        if "offset" in a:
            pre = pre._replace(mean2d=pre.mean2d + a["offset"])
        if "colors" in a:
            rgb = a["colors"]
        else:
            rgb = sh_to_color(active_sh_degree, a["sh"], a["xyz"],
                              cam_center)
        # The reference accumulates dL/ddepth per gaussian but never
        # applies it to means (backward.cu:573-580 vs preprocess);
        # stop_depth_grad=True replicates that dead-end. The
        # alpha-coupling path is unaffected.
        depth_const = jax.lax.stop_gradient(pre.depth) if stop_depth_grad \
            else pre.depth
        parts = [rgb]
        if include_lang_feat:
            parts.append(a["lang_feat"])
        parts.append(depth_const[:, None])
        return pre, jnp.concatenate(parts, axis=-1)

    args = dict(xyz=means3d, scales=scales, quats=quats, valid=valid)
    if mean2d_offset is not None:
        args["offset"] = mean2d_offset
    if colors_precomp is not None:
        args["colors"] = colors_precomp
    else:
        args["sh"] = sh
    if include_lang_feat:
        args["lang_feat"] = lang_feat
    ps = getattr(cfg, "p_slabs", 0)
    if ps and means3d.shape[0] % ps == 0:
        pre, feats = prefix_map(
            pre_feats,
            lambda a: _pre_skip_out(a["valid"].shape[0], n_feat),
            args, watermark(valid), ps)
    else:
        pre, feats = pre_feats(args)
    pre, height = _apply_crop(pre, crop_y, crop_h, height)

    if binning is None:
        binning, overflow = make_binning(pre, width, height, cfg,
                                         max_per_tile, opacity=opacity)
    else:
        binning, overflow = binning
        # a cached binning references gaussian SLOTS; the caller must
        # invalidate on any store surgery (densify/prune/increase/reset)
        binning = jax.tree.map(jax.lax.stop_gradient, binning)
    kfin = None
    if cfg.backend == "pallas":
        from legslam_tpu.ops.pallas.composite import composite_image_pallas
        nb = getattr(cfg, "n_buckets", 1)
        out = composite_image_pallas(
            binning, pre.mean2d, pre.conic, opacity, feats, width, height,
            cfg.tile_w, cfg.tile_h, cfg.max_pairs, cfg.chunk,
            interpret=cfg.pallas_interpret, differentiable=True,
            n_buckets=nb, mm_dtype=getattr(cfg, "mm_dtype", "float32"),
            power_mode=getattr(cfg, "power_mode", "vpu"),
            emit_kfin=emit_kfin and nb == 1)
        img, t_final = out[0], out[1]
        if emit_kfin and nb == 1:
            kfin = out[2]
        img = img[..., :feats.shape[-1]]
    else:
        img, t_final = _composite_tiles(
            binning, pre.mean2d, pre.conic, opacity, feats,
            width, height, cfg, max_per_tile)

    color = img[..., :3] + t_final[..., None] * bg[None, None]
    lf = img[..., 3:-1] if include_lang_feat else None
    depth = img[..., -1]
    return RasterizeOutput(color=color, lang_feat=lf, depth=depth,
                           final_t=t_final, radii=pre.radius,
                           num_rendered=binning.num_rendered,
                           overflow_pairs=overflow.astype(jnp.int32),
                           kfin=kfin)


def rasterize(means3d: jnp.ndarray, sh: jnp.ndarray, lang_feat: jnp.ndarray,
              opacity: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
              valid: jnp.ndarray, view: CameraView, bg: jnp.ndarray,
              active_sh_degree: int, cfg: RasterizeConfig | None = None,
              include_lang_feat: bool = True, scale_modifier: float = 1.0,
              mean2d_offset: jnp.ndarray | None = None,
              max_per_tile: int = 2048,
              colors_precomp: jnp.ndarray | None = None,
              stop_depth_grad: bool = True) -> RasterizeOutput:
    """Render activated gaussian parameters from a camera view.

    Args:
      means3d: [P, 3] world positions.
      sh: [P, K, 3] SH coefficients (DC first; K >= (deg+1)^2).
      lang_feat: [P, LF] language features.
      opacity: [P] activated (sigmoid) opacities.
      scales: [P, 3] activated (exp) scales.
      quats: [P, 4] wxyz rotations (normalized inside).
      valid: [P] bool mask of live gaussians in the padded store.
      mean2d_offset: optional [P, 2] zeros; gradients w.r.t. it are the
        pixel-space mean2D grads used for densification stats (the
        reference's screenspace_points trick, gaussian_renderer.cpp:41-48;
        NDC-convention scaling 0.5*W/H is applied by the caller, matching
        backward.cu ddelx_dx).
    """
    cfg = cfg or RasterizeConfig()
    means3d, sh, lang_feat, opacity, scales, quats, valid = (
        jnp.asarray(a) for a in
        (means3d, sh, lang_feat, opacity, scales, quats, valid))
    return render_arrays(
        means3d, sh, lang_feat, opacity, scales, quats, valid,
        view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, view.width, view.height, bg,
        active_sh_degree, cfg, include_lang_feat, scale_modifier,
        mean2d_offset, max_per_tile, colors_precomp, stop_depth_grad)
