"""Multi-chip training: spatial (tile-row) sharding of a SINGLE view.

The second TPU-native scaling axis, complementing parallel/sharded.py's
data-parallel multi-view batching: the image is split into horizontal
strips of whole tile rows, each device renders + differentiates ONLY its
strip against the replicated Gaussian store, and XLA reduces the parameter
gradients over ICI. This accelerates the latency-critical single-keyframe
mapping iteration itself (gaussian_mapper.cpp:624-798 renders one view per
iteration — the reference has no equivalent, being strictly single-GPU,
SURVEY.md §2 end).

How a strip render stays exact (ops/rasterize.py crop_y/crop_h): the
projection, EWA clamp and focal lengths are computed for the FULL image,
then the screen-space means are shifted by the strip's row offset and
binning + compositing run at the strip height. Per-tile pair lists and
front-to-back order are identical to the full render, so strip outputs
match the full render's rows bit-for-bit per tile (see
tests/test_spatial.py) whenever the full render has span_overflow == 0.

Loss decomposition (must reproduce ops/losses.mapping_loss over the full
image exactly):
  * L1(color) + DSSIM need cross-strip windows -> reassemble the strip
    colors into the full image (cheap: [H, W, 3]) and reuse the library
    terms verbatim.
  * LF-cosine and depth-L1 are pixel-pointwise means -> computed on the
    reassembled (still row-sharded) padded arrays with zeroed pad rows and
    rescaled by H_pad / H, which equals the full-image mean because padded
    rows contribute exactly zero (masked render, zero GT).

Layout: Gaussian state replicated; GT tensors padded to H_pad = n_strips *
h_local rows and sharded on the row axis; the cached per-strip binning
(spatial_compute_binning) sharded on its leading strip axis.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.mapper.train_step import StepAux, make_lrs
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops import losses
from legslam_tpu.ops.rasterize import compute_binning, render_arrays


class SpatialLayout(NamedTuple):
    n_strips: int
    h_local: int       # strip height in pixels (tile_h multiple)
    h_padded: int      # n_strips * h_local >= image height


def spatial_layout(height: int, tile_h: int, n_strips: int) -> SpatialLayout:
    """Split `height` pixel rows into n_strips whole-tile-row strips."""
    nty = -(-height // tile_h)
    rows_per = -(-nty // n_strips)
    return SpatialLayout(n_strips=n_strips, h_local=rows_per * tile_h,
                         h_padded=n_strips * rows_per * tile_h)


def pad_rows(arr: jnp.ndarray, h_padded: int) -> jnp.ndarray:
    """Zero-pad the leading (row) axis to h_padded."""
    pad = [(0, h_padded - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def shard_rows(tree, mesh: Mesh, axis: str = "data"):
    """Place row-padded image tensors with the row axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def strip_offsets(layout: SpatialLayout, mesh: Mesh | None = None,
                  axis: str = "data") -> jnp.ndarray:
    """[n_strips] pixel-row offset of each strip; sharded when a mesh is
    given so XLA pins the strip axis of everything vmapped over it."""
    ys = jnp.arange(layout.n_strips, dtype=jnp.float32) * layout.h_local
    if mesh is not None:
        ys = jax.device_put(ys, NamedSharding(mesh, P(axis)))
    return ys


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cfg", "max_per_tile", "h_local",
                     "gather_mesh"))
def spatial_compute_binning(means3d, scales, quats, valid, world_view,
                            full_proj, tan_fovx, tan_fovy, crop_ys,
                            *, width: int, height: int, h_local: int,
                            cfg: RasterizeConfig, max_per_tile: int = 2048,
                            opacity=None, gather_mesh: Mesh | None = None):
    """Per-strip binning cache: vmap of ops.rasterize.compute_binning over
    the strip offsets. Leaves get a leading [n_strips] axis that callers
    keep sharded on the mesh (shard_rows). Activated scales/opacity, like
    compute_binning. With gather_mesh (capacity-sharded store,
    parallel/capacity.py) the per-gaussian inputs are all-gathered first
    — binning needs the full depth order."""
    if gather_mesh is not None:
        rep = NamedSharding(gather_mesh, P())
        gather = lambda t: jax.lax.with_sharding_constraint(t, rep)  # noqa: E731
        means3d, scales, quats, valid = map(
            gather, (means3d, scales, quats, valid))
        if opacity is not None:
            opacity = gather(opacity)

    def one(cy):
        return compute_binning(
            means3d, scales, quats, valid, world_view, full_proj,
            tan_fovx, tan_fovy, width=width, height=height, cfg=cfg,
            max_per_tile=max_per_tile, opacity=opacity,
            crop_y=cy, crop_h=h_local)
    return jax.vmap(one)(crop_ys)


def _strip_view_loss(params7, valid, world_view, full_proj, cam_center,
                     tan_fovx, tan_fovy, gt_color_pad, gt_lang_feat_pad,
                     gt_depth_pad, mask_pad, bg, crop_ys, mean2d_offset,
                     binning, *, width: int, height: int, h_local: int,
                     active_sh_degree: int, lam: float,
                     cfg: RasterizeConfig, include_lang_feat: bool,
                     max_per_tile: int):
    """ONE view's strip-decomposed render + mapping loss — the single
    definition both spatial steps share. Returns
    (loss, color_pad, depth_pad, radii [S, P], num_rendered, overflow).

    Loss decomposition (== ops/losses.mapping_loss on the full image,
    gaussian_mapper.cpp:711-721 — the mask multiplies ONLY the rendered
    side): L1+DSSIM on the reassembled color, pointwise LF-cos/depth
    terms on the padded rows rescaled by H_pad/H (zero pad rows
    contribute exactly zero)."""
    xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation = params7
    sh = jnp.concatenate([f_dc, f_rest], axis=1)
    H_pad = gt_color_pad.shape[0]
    rescale = H_pad / float(height)

    def strip(cy, b):
        out = render_arrays(
            xyz, sh, lang_feat, jax.nn.sigmoid(opacity[:, 0]),
            jnp.exp(scaling), rotation, valid, world_view, full_proj,
            cam_center, tan_fovx, tan_fovy, width, height, bg,
            active_sh_degree, cfg, include_lang_feat=include_lang_feat,
            mean2d_offset=mean2d_offset, max_per_tile=max_per_tile,
            binning=b, crop_y=cy, crop_h=h_local)
        lf = out.lang_feat if include_lang_feat else \
            jnp.zeros(out.color.shape[:2] + (0,), out.color.dtype)
        return (out.color, lf, out.depth, out.radii, out.num_rendered,
                out.overflow_pairs)

    outs = jax.vmap(strip, in_axes=(0, 0 if binning is not None
                                    else None))(crop_ys, binning)
    color = outs[0].reshape(H_pad, width, 3)
    depth = outs[2].reshape(H_pad, width)
    m3 = mask_pad[..., None]
    pc_full = (color * m3)[:height]
    loss = (1.0 - lam) * losses.l1_loss(pc_full, gt_color_pad[:height]) \
        + lam * (1.0 - losses.ssim(pc_full, gt_color_pad[:height]))
    if include_lang_feat:
        lf_img = outs[1].reshape(H_pad, width, -1)
        # mask folded into the cosine reductions (same fused custom VJP
        # as mapping_loss — the masked [H, W, 64] temp never materializes)
        loss = loss + rescale * losses._lf_cos_masked(
            lf_img, gt_lang_feat_pad, mask_pad, 1e-8)
    loss = loss + rescale * losses.l1_loss(depth * mask_pad, gt_depth_pad)
    return (loss, color, depth, outs[3], jnp.sum(outs[4]),
            jnp.sum(outs[5]))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "active_sh_degree", "opt", "cfg",
                     "include_lang_feat", "max_per_tile", "h_local",
                     "gather_mesh"))
def spatial_train_step(state: G.GaussianState,
                       world_view, full_proj, cam_center, tan_fovx,
                       tan_fovy, gt_color_pad, gt_lang_feat_pad,
                       gt_depth_pad, mask_pad, bg, position_lr_step,
                       spatial_lr_scale, crop_ys,
                       *, width: int, height: int, h_local: int,
                       active_sh_degree: int, opt: OptimizationParams,
                       cfg: RasterizeConfig, include_lang_feat: bool = True,
                       max_per_tile: int = 2048, binning=None,
                       gather_mesh: Mesh | None = None):
    """One single-view optimization iteration, tile-row-sharded.

    Semantics match mapper/train_step.train_step on the same view exactly
    (same loss, same gradients, same Adam update, same densify stats):
    strips partition the pixels, so per-parameter gradients are the sum of
    strip gradients and the screen-space densify grads accumulate once per
    gaussian like a single-view step. GT tensors come in padded to
    h_padded = n_strips * h_local rows (pad_rows) with mask zero on pad
    rows; `binning` is an optional cached spatial_compute_binning result.

    With gather_mesh set (capacity-sharded store, parallel/capacity.py)
    the parameter shards pass through a replicated sharding constraint
    inside the loss: forward = all-gather of the render working set,
    transpose = gradients routed back toward the owner shards, and the
    Adam/stat updates stay sharded. Semantically the identity — outputs
    match the replicated-store step exactly.
    """
    p = state.params
    H_pad = gt_color_pad.shape[0]
    n_strips = crop_ys.shape[0]
    assert H_pad == n_strips * h_local, (H_pad, n_strips, h_local)
    # one shared offset, like the single-view step: strip mean2d grads sum
    # into the exact single-view screen-space grad (strips partition pixels)
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
    if gather_mesh is not None:
        rep = NamedSharding(gather_mesh, P())
        gather = lambda t: jax.lax.with_sharding_constraint(t, rep)  # noqa: E731
        valid_full = gather(state.valid)
    else:
        gather = lambda t: t  # noqa: E731
        valid_full = state.valid

    def loss_fn(xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation,
                mean2d_offset):
        (xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation,
         mean2d_offset) = map(gather, (xyz, f_dc, f_rest, lang_feat,
                                       opacity, scaling, rotation,
                                       mean2d_offset))
        loss, color, depth, radii_s, num_rendered, overflow = \
            _strip_view_loss(
                (xyz, f_dc, f_rest, lang_feat, opacity, scaling,
                 rotation), valid_full, world_view, full_proj,
                cam_center, tan_fovx, tan_fovy, gt_color_pad,
                gt_lang_feat_pad, gt_depth_pad, mask_pad, bg, crop_ys,
                mean2d_offset, binning, width=width, height=height,
                h_local=h_local, active_sh_degree=active_sh_degree,
                lam=opt.lambda_dssim, cfg=cfg,
                include_lang_feat=include_lang_feat,
                max_per_tile=max_per_tile)
        return loss, (color, depth, radii_s, num_rendered, overflow)

    grad_fn = jax.value_and_grad(loss_fn, argnums=tuple(range(8)),
                                 has_aux=True)
    (loss, (color, depth, radii_s, num_rendered, overflow)), grads = \
        grad_fn(p.xyz, p.f_dc, p.f_rest, p.lang_feat, p.opacity, p.scaling,
                p.rotation, offset0)
    g_params = G.GaussianParams(
        xyz=grads[0], f_dc=grads[1], f_rest=grads[2], lang_feat=grads[3],
        opacity=grads[4], scaling=grads[5], rotation=grads[6])
    g_params = jax.tree.map(
        lambda g: jnp.where(
            state.valid[(...,) + (None,) * (g.ndim - 1)], g, 0.0), g_params)

    radii = jnp.max(radii_s, axis=0)  # identical per strip (full preprocess)
    ndc_scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    state = G.add_densification_stats(state, grads[7] * ndc_scale[None, :],
                                      radii)
    lrs = make_lrs(opt, spatial_lr_scale, position_lr_step)
    state = G.adam_update(state, g_params, lrs)

    mh = mask_pad[:height][..., None]
    psnr = losses.psnr(color[:height] * mh,
                       gt_color_pad[:height] * mh)
    return state, StepAux(loss=loss, color=color[:height],
                          depth=depth[:height], radii=radii, psnr=psnr,
                          num_rendered=num_rendered,
                          overflow_pairs=overflow)


def make_mesh2d(n_views: int, n_strips: int, devices=None) -> Mesh:
    """('data', 'strip') 2D mesh: views x strips = n_views * n_strips
    devices — the composition of both scaling axes (each view's image is
    strip-sharded while views run data-parallel)."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    need = n_views * n_strips
    if len(devices) < need:
        raise ValueError(
            f"make_mesh2d({n_views}, {n_strips}): only {len(devices)} "
            f"devices available for a {need}-device mesh")
    grid = np.array(devices[:need]).reshape(n_views, n_strips)
    return Mesh(grid, axis_names=("data", "strip"))


def shard_batch_rows(batch, mesh: Mesh) -> "object":
    """Place a ViewBatch whose GT images are row-padded: batch axis over
    'data', image rows over 'strip' (poses/fovs batch-only)."""
    img = NamedSharding(mesh, P("data", "strip"))
    vec = NamedSharding(mesh, P("data"))
    return type(batch)(
        world_view=jax.device_put(batch.world_view, vec),
        full_proj=jax.device_put(batch.full_proj, vec),
        cam_center=jax.device_put(batch.cam_center, vec),
        tan_fovx=jax.device_put(batch.tan_fovx, vec),
        tan_fovy=jax.device_put(batch.tan_fovy, vec),
        gt_color=jax.device_put(batch.gt_color, img),
        gt_lang_feat=jax.device_put(batch.gt_lang_feat, img),
        gt_depth=jax.device_put(batch.gt_depth, img),
        mask=jax.device_put(batch.mask, img))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "active_sh_degree", "opt", "cfg",
                     "include_lang_feat", "max_per_tile", "h_local"))
def spatial_batched_train_step(state: G.GaussianState, batch,
                               bg, position_lr_step, spatial_lr_scale,
                               crop_ys,
                               *, width: int, height: int, h_local: int,
                               active_sh_degree: int,
                               opt: OptimizationParams,
                               cfg: RasterizeConfig,
                               include_lang_feat: bool = True,
                               max_per_tile: int = 2048):
    """Both axes at once: data-parallel over keyframes AND tile-row
    sharded within each view (parallel/sharded.batched_train_step with
    each per-view render decomposed like spatial_train_step). `batch` is
    a sharded.ViewBatch whose GT images are row-padded to
    n_strips * h_local (pad_rows) — shard with shard_batch_rows on a
    make_mesh2d ('data', 'strip') mesh. Semantics: identical to the
    DP batched step (per-view masked loss mean, per-view densify stats).
    """
    p = state.params
    B, H_pad = batch.gt_color.shape[:2]
    lam = opt.lambda_dssim
    offset0 = jnp.zeros((B, state.capacity, 2), jnp.float32)

    def view_loss(params_tuple, one, off):
        loss, color, depth, radii_s, _, overflow = _strip_view_loss(
            params_tuple, state.valid, one.world_view, one.full_proj,
            one.cam_center, one.tan_fovx, one.tan_fovy, one.gt_color,
            one.gt_lang_feat, one.gt_depth, one.mask, bg, crop_ys, off,
            None, width=width, height=height, h_local=h_local,
            active_sh_degree=active_sh_degree, lam=lam, cfg=cfg,
            include_lang_feat=include_lang_feat,
            max_per_tile=max_per_tile)
        return loss, (color[:height], depth[:height],
                      jnp.max(radii_s, axis=0), overflow)

    def total_loss(xyz, f_dc, f_rest, lang_feat, opacity, scaling,
                   rotation, off):
        params_tuple = (xyz, f_dc, f_rest, lang_feat, opacity, scaling,
                        rotation)
        per_view = jax.vmap(
            lambda one, o: view_loss(params_tuple, one, o))(batch, off)
        loss = jnp.mean(per_view[0])
        color, depth, radii, overflow = per_view[1]
        return loss, (color, depth, radii, overflow)

    grad_fn = jax.value_and_grad(total_loss, argnums=tuple(range(8)),
                                 has_aux=True)
    (loss, (color, depth, radii, overflow)), grads = grad_fn(
        p.xyz, p.f_dc, p.f_rest, p.lang_feat, p.opacity, p.scaling,
        p.rotation, offset0)
    g_params = G.GaussianParams(
        xyz=grads[0], f_dc=grads[1], f_rest=grads[2], lang_feat=grads[3],
        opacity=grads[4], scaling=grads[5], rotation=grads[6])
    g_params = jax.tree.map(
        lambda g: jnp.where(
            state.valid[(...,) + (None,) * (g.ndim - 1)], g, 0.0), g_params)

    ndc_scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    per_view_grads = grads[7] * float(B) * ndc_scale[None, None, :]
    state = G.add_densification_stats_batched(state, per_view_grads,
                                              radii)
    lrs = make_lrs(opt, spatial_lr_scale, position_lr_step)
    state = G.adam_update(state, g_params, lrs)

    mh = batch.mask[:, :height][..., None]
    psnr = losses.psnr(color * mh, batch.gt_color[:, :height] * mh)
    return state, StepAux(loss=loss, color=color[0], depth=depth[0],
                          radii=jnp.max(radii, axis=0), psnr=psnr,
                          num_rendered=0,
                          overflow_pairs=jnp.sum(overflow))
