"""Jitted mapping-training step.

Equivalent of the hot path of GaussianMapper::trainForOneIteration
(src/gaussian_mapper.cpp:624-798): render (RGB+LF+depth), masked loss
(1-λ)L1 + λ(1-SSIM) + mean-cos(LF) + L1(depth), backward, Adam step, and
densification-stat accumulation — all fused in one XLA computation. The
reference's screenspace_points gradient trick (gaussian_renderer.cpp:41-48)
becomes an explicit zero `mean2d_offset` argument whose gradient is taken
alongside the parameter gradients; the NDC-convention scaling 0.5*W/H
(backward.cu ddelx_dx/ddely_dy) is applied before the stats update so the
densify_grad_threshold keeps its reference calibration.

Episodic operations (densify/prune, opacity reset) stay in
models/gaussians.py and are invoked by the mapper between steps — they are
static-shape too, so none of this ever re-jits as the map grows.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops import losses
from legslam_tpu.ops.rasterize import rasterize


class StepAux(NamedTuple):
    loss: jnp.ndarray
    color: jnp.ndarray
    depth: jnp.ndarray
    radii: jnp.ndarray
    psnr: jnp.ndarray
    num_rendered: jnp.ndarray | int = 0
    overflow_pairs: jnp.ndarray | int = 0
    # per-tile termination watermark (pallas backend, emit_kfin steps
    # only); feeds ops.binning.trim_binning for the cached-binning reuse
    # steps of a refresh group
    kfin: jnp.ndarray | None = None
    # [4] f32 (loss, overflow_pairs, num_rendered, num_valid) packed on
    # device so a periodic host sync is ONE fetch (each scalar read pays
    # a full tunnel round trip on axon); num_valid feeds the mapper's
    # capacity-ladder growth decision
    sync3: jnp.ndarray | None = None


def make_lrs(opt: OptimizationParams, spatial_lr_scale,
             position_lr_step) -> dict[str, Any]:
    """Per-group learning rates (gaussian_model.cpp:488-511: f_rest =
    feature_lr/20; position LR log-lerp scheduled by `position_lr_step` and
    scaled by the scene extent, gaussian_mapper.cpp:671-684)."""
    xyz_lr = G.expon_lr(
        position_lr_step,
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps)
    return dict(
        xyz=xyz_lr, f_dc=opt.feature_lr, f_rest=opt.feature_lr / 20.0,
        lang_feat=opt.lang_feature_lr, opacity=opt.opacity_lr,
        scaling=opt.scaling_lr, rotation=opt.rotation_lr)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "active_sh_degree", "opt", "cfg",
                     "include_lang_feat", "max_per_tile", "emit_kfin",
                     "gather_mesh"))
def train_step(state: G.GaussianState,
               world_view: jnp.ndarray, full_proj: jnp.ndarray,
               cam_center: jnp.ndarray, tan_fovx, tan_fovy,
               gt_color: jnp.ndarray, gt_lang_feat: jnp.ndarray | None,
               gt_depth: jnp.ndarray, mask: jnp.ndarray,
               bg: jnp.ndarray, position_lr_step, spatial_lr_scale,
               *, width: int, height: int, active_sh_degree: int,
               opt: OptimizationParams, cfg: RasterizeConfig,
               include_lang_feat: bool = True, max_per_tile: int = 2048,
               binning=None, emit_kfin: bool = False, gather_mesh=None):
    """One optimization iteration. Returns (new_state, StepAux).

    `binning` (optional): a cached (Binning, overflow) pair from
    ops.rasterize.compute_binning — skips the sort-dominated prep pipeline
    for views whose geometry hasn't moved materially since the cache was
    built (mapper binning_refresh_interval).

    `gather_mesh` (optional): capacity-sharded (FSDP-style) store on a
    plain 1D data mesh (parallel/capacity.py) WITHOUT strip rendering —
    the parameter shards pass through a replicated sharding constraint
    inside the loss (forward = all-gather of the render working set over
    ICI, transpose = gradient cotangents routed back to the owner
    shards) while Adam moments / densify stats stay sharded.
    Semantically the identity; persistent store memory ~1/D per device."""
    from legslam_tpu.ops.rasterize import render_arrays

    if gt_lang_feat is not None and \
            gt_lang_feat.shape[:2] != (height, width):
        # raw 37x37 grid from the encoder: upsample INSIDE the jit —
        # the mapper used to call upsample_lf eagerly per iteration,
        # which is several ~10-19 ms host dispatches over the axon
        # tunnel plus an un-fused 78-218 MB materialization per step
        gt_lang_feat = upsample_lf(gt_lang_feat, height, width)

    p = state.params
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)
    if gather_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
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
        sh = jnp.concatenate([f_dc, f_rest], axis=1)
        out = render_arrays(
            xyz, sh, lang_feat, jax.nn.sigmoid(opacity[:, 0]),
            jnp.exp(scaling), rotation, valid_full, world_view, full_proj,
            cam_center, tan_fovx, tan_fovy, width, height, bg,
            active_sh_degree, cfg, include_lang_feat=include_lang_feat,
            mean2d_offset=mean2d_offset, max_per_tile=max_per_tile,
            binning=binning, emit_kfin=emit_kfin)
        loss = losses.mapping_loss(
            out.color, gt_color, out.lang_feat, gt_lang_feat, out.depth,
            gt_depth, mask, opt.lambda_dssim)
        return loss, (out.color, out.depth, out.radii, out.num_rendered,
                      out.overflow_pairs, out.kfin)

    grad_fn = jax.value_and_grad(loss_fn, argnums=tuple(range(8)),
                                 has_aux=True)
    (loss, (color, depth, radii, num_rendered, overflow_pairs, kfin)), \
        grads = grad_fn(
        p.xyz, p.f_dc, p.f_rest, p.lang_feat, p.opacity, p.scaling,
        p.rotation, offset0)
    g_params = G.GaussianParams(
        xyz=grads[0], f_dc=grads[1], f_rest=grads[2], lang_feat=grads[3],
        opacity=grads[4], scaling=grads[5], rotation=grads[6])
    mean2d_grad_pix = grads[7]

    # zero grads of invalid slots so their Adam moments only decay; under
    # the watermark slab-skip (cfg.p_slabs) the zeroing is fused into the
    # adam pass instead of a separate full-capacity read+write
    ps = getattr(cfg, "p_slabs", 0)
    if not ps:
        g_params = jax.tree.map(
            lambda g: jnp.where(
                state.valid[(...,) + (None,) * (g.ndim - 1)], g, 0.0),
            g_params)

    # densification stats in the reference's NDC convention
    ndc_scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    state = G.add_densification_stats(
        state, mean2d_grad_pix * ndc_scale[None, :], radii, n_slabs=ps)

    lrs = make_lrs(opt, spatial_lr_scale, position_lr_step)
    state = G.adam_update(state, g_params, lrs, n_slabs=ps,
                          zero_invalid=bool(ps))

    m = mask if mask.ndim == 2 else mask[..., 0]
    psnr = losses.psnr(color * m[..., None], gt_color * m[..., None])
    sync3 = jnp.stack([loss.astype(jnp.float32),
                       jnp.asarray(overflow_pairs, jnp.float32),
                       jnp.asarray(num_rendered, jnp.float32),
                       state.num_valid().astype(jnp.float32)])
    return state, StepAux(loss=loss, color=color, depth=depth, radii=radii,
                          psnr=psnr, num_rendered=num_rendered,
                          overflow_pairs=overflow_pairs, kfin=kfin,
                          sync3=sync3)


def upsample_lf(lf_small: jnp.ndarray, height: int, width: int
                ) -> jnp.ndarray:
    """Bilinear upsample of the 37x37x64 language-feature image to render
    resolution (gaussian_mapper.cpp:707-708, torch interpolate
    align_corners=False == jax.image.resize 'linear' half-pixel)."""
    return jax.image.resize(lf_small, (height, width, lf_small.shape[-1]),
                            method="linear")
