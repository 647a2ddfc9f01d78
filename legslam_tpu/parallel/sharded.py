"""Multi-chip training: data-parallel over keyframes on a device mesh.

The reference is strictly single-GPU (SURVEY.md §2 end: no collective layer
exists anywhere in it). The TPU-native scaling axis we add is multi-VIEW
mapping: each chip renders + differentiates a different keyframe against the
replicated Gaussian store; XLA inserts the psum over ICI for the gradient
reduction. This turns the online mapper's one-keyframe-per-iteration loop
(gaussian_mapper.cpp:624-798) into an n-keyframe batched step with the same
per-view semantics (per-view masked loss, mean over views).

Layout:
  * Gaussian state: replicated (the store is read by every view and the
    Adam update is identical everywhere).
  * View bundle (poses, GT images, masks): sharded on the leading batch
    axis over the 'data' mesh axis.
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
from legslam_tpu.ops.rasterize import render_arrays


class ViewBatch(NamedTuple):
    """Stacked per-keyframe tensors, leading axis = batch (sharded)."""
    world_view: jnp.ndarray   # [B, 4, 4]
    full_proj: jnp.ndarray    # [B, 4, 4]
    cam_center: jnp.ndarray   # [B, 3]
    tan_fovx: jnp.ndarray     # [B]
    tan_fovy: jnp.ndarray     # [B]
    gt_color: jnp.ndarray     # [B, H, W, 3]
    gt_lang_feat: jnp.ndarray  # [B, H, W, LF]
    gt_depth: jnp.ndarray     # [B, H, W]
    mask: jnp.ndarray         # [B, H, W]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}): only {len(devices)} devices "
                "available — force the virtual CPU platform first "
                "(legslam_tpu.utils.runtime.force_cpu)")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "active_sh_degree", "opt", "cfg",
                     "include_lang_feat", "max_per_tile"))
def batched_train_step(state: G.GaussianState, batch: ViewBatch,
                       bg: jnp.ndarray, position_lr_step, spatial_lr_scale,
                       *, width: int, height: int, active_sh_degree: int,
                       opt: OptimizationParams, cfg: RasterizeConfig,
                       include_lang_feat: bool = True,
                       max_per_tile: int = 2048):
    """One data-parallel step over a batch of keyframes.

    Under a jit with sharded `batch` inputs, the per-view render/loss/grad
    runs fully parallel on the mesh; the mean over views becomes a psum.
    """
    p = state.params
    n_views = batch.gt_color.shape[0]
    # one mean2D-offset PER VIEW: its gradient gives per-view screen-space
    # grads so densify stats accumulate mean-of-norms (one denom increment
    # per visit), not norm-of-mean — matching the reference's per-iteration
    # addDensificationStats semantics (gaussian_model.cpp:834-847)
    offset0 = jnp.zeros((n_views, state.capacity, 2), jnp.float32)

    def view_loss(params_tuple, one, off):
        xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation = \
            params_tuple
        sh = jnp.concatenate([f_dc, f_rest], axis=1)
        out = render_arrays(
            xyz, sh, lang_feat, jax.nn.sigmoid(opacity[:, 0]),
            jnp.exp(scaling), rotation, state.valid, one.world_view,
            one.full_proj, one.cam_center, one.tan_fovx, one.tan_fovy,
            width, height, bg, active_sh_degree, cfg,
            include_lang_feat=include_lang_feat, mean2d_offset=off,
            max_per_tile=max_per_tile)
        loss = losses.mapping_loss(
            out.color, one.gt_color,
            out.lang_feat, one.gt_lang_feat if include_lang_feat else None,
            out.depth, one.gt_depth, one.mask, opt.lambda_dssim)
        return loss, (out.color, out.depth, out.radii, out.overflow_pairs)

    def total_loss(xyz, f_dc, f_rest, lang_feat, opacity, scaling, rotation,
                   off):
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

    # per-view screen grads: undo the 1/B of the mean-loss so each view's
    # norm matches what a single-view iteration would accumulate
    ndc_scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    per_view_grads = grads[7] * float(n_views) * ndc_scale[None, None, :]
    state = G.add_densification_stats_batched(state, per_view_grads, radii)

    lrs = make_lrs(opt, spatial_lr_scale, position_lr_step)
    state = G.adam_update(state, g_params, lrs)

    psnr = losses.psnr(color * batch.mask[..., None],
                       batch.gt_color * batch.mask[..., None])
    return state, StepAux(loss=loss, color=color[0], depth=depth[0],
                          radii=jnp.max(radii, axis=0), psnr=psnr,
                          overflow_pairs=jnp.sum(overflow))


def shard_batch(batch: ViewBatch, mesh: Mesh) -> ViewBatch:
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(state: G.GaussianState, mesh: Mesh) -> G.GaussianState:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
