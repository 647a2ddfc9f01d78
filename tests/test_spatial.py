"""Spatial (tile-row) sharding of the single-view train step on the
8-device virtual CPU mesh: strip renders and the decomposed loss must
reproduce mapper/train_step.train_step exactly (same loss, same updated
parameters, same densify stats), and the cached per-strip binning must
match fresh binning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.mapper.train_step import train_step
from legslam_tpu.models import gaussians as G
from legslam_tpu.parallel import sharded, spatial

from .util import simple_view

# span caps cover the whole tile grid: strip == full-render parity is
# only exact when the full render drops nothing to the static span cap
# (a strip clamps rects at its edge, so it truncates strictly less)
CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1, max_span_y=6,
                      chunk=32, tile_batch=2, max_pairs=1 << 14)
OPT = OptimizationParams()
W, H = 128, 88  # H NOT a tile_h multiple: exercises row padding (88->96)


def _scene(rng, n=96, cap=128):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    return G.create_from_pcd(
        pts, rng.uniform(size=(n, 3)).astype(np.float32), capacity=cap)


def _gts(rng):
    gt_color = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(H, W, 64)), jnp.float32)
    gt_depth = jnp.full((H, W), 2.5, jnp.float32)
    mask = jnp.ones((H, W), jnp.float32)
    return gt_color, gt_lf, gt_depth, mask


def _spatial_args(layout, gt_color, gt_lf, gt_depth, mask, mesh=None):
    pads = [spatial.pad_rows(a, layout.h_padded)
            for a in (gt_color, gt_lf, gt_depth, mask)]
    if mesh is not None:
        pads = spatial.shard_rows(pads, mesh)
    cys = spatial.strip_offsets(layout, mesh)
    return pads, cys


def _run_spatial(st, view, pads, cys, layout, binning=None):
    return spatial.spatial_train_step(
        st, view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, pads[0], pads[1], pads[2], pads[3],
        jnp.zeros(3), jnp.asarray(0.0), 1.0, cys,
        width=W, height=H, h_local=layout.h_local, active_sh_degree=0,
        opt=OPT, cfg=CFG, max_per_tile=128, binning=binning)


def _run_single(st, view, gt_color, gt_lf, gt_depth, mask):
    return train_step(
        st, view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
        jnp.zeros(3), jnp.asarray(0.0), 1.0,
        width=W, height=H, active_sh_degree=0, opt=OPT, cfg=CFG,
        max_per_tile=128)


@pytest.mark.parametrize("n_strips", [2, 8])
def test_spatial_matches_single_view(rng, n_strips):
    """Strip-sharded step == single-view step: loss, aux, params."""
    st = _scene(rng)
    view = simple_view(width=W, height=H, fx=60.0, fy=60.0)
    gt_color, gt_lf, gt_depth, mask = _gts(rng)
    layout = spatial.spatial_layout(H, CFG.tile_h, n_strips)
    pads, cys = _spatial_args(layout, gt_color, gt_lf, gt_depth, mask)

    st_sp, aux_sp = _run_spatial(st, view, pads, cys, layout)
    st_sv, aux_sv = _run_single(st, view, gt_color, gt_lf, gt_depth, mask)

    np.testing.assert_allclose(float(aux_sp.loss), float(aux_sv.loss),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(aux_sp.color),
                               np.asarray(aux_sv.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_sp.depth),
                               np.asarray(aux_sv.depth), atol=1e-6)
    np.testing.assert_allclose(float(aux_sp.psnr), float(aux_sv.psnr),
                               rtol=1e-5)
    assert int(aux_sp.num_rendered) >= int(aux_sv.num_rendered)
    # parameters after the Adam step: grads match => updates match.
    # (eps=1e-15 Adam amplifies ulp-level grad noise for near-zero
    # moments, hence the modest atol relative to the LR scale.)
    for name in ("xyz", "f_dc", "f_rest", "lang_feat", "opacity", "scaling", "rotation"):
        a = np.asarray(getattr(st_sp.params, name))
        b = np.asarray(getattr(st_sv.params, name))
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(st_sp.stats.grad_accum),
                               np.asarray(st_sv.stats.grad_accum),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sp.stats.denom),
                               np.asarray(st_sv.stats.denom), atol=0)


def test_spatial_on_mesh_with_cached_binning(rng):
    """Runs sharded on the 8-device mesh with a cached per-strip binning;
    cached == fresh, state stays replicated, loss finite."""
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh(8)
    st = sharded.replicate_state(_scene(rng), mesh)
    view = simple_view(width=W, height=H, fx=60.0, fy=60.0)
    gt_color, gt_lf, gt_depth, mask = _gts(rng)
    layout = spatial.spatial_layout(H, CFG.tile_h, 8)
    pads, cys = _spatial_args(layout, gt_color, gt_lf, gt_depth, mask,
                              mesh=mesh)

    p = st.params
    binning = spatial.spatial_compute_binning(
        p.xyz, jnp.exp(p.scaling), p.rotation, st.valid, view.world_view,
        view.full_proj, view.tan_fovx, view.tan_fovy, cys,
        width=W, height=H, h_local=layout.h_local, cfg=CFG,
        max_per_tile=128, opacity=jax.nn.sigmoid(p.opacity[:, 0]))

    st_c, aux_c = _run_spatial(st, view, pads, cys, layout, binning=binning)
    st_f, aux_f = _run_spatial(st, view, pads, cys, layout)
    assert np.isfinite(float(aux_c.loss))
    np.testing.assert_allclose(float(aux_c.loss), float(aux_f.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_c.color),
                               np.asarray(aux_f.color), atol=1e-6)
    for name in ("xyz", "f_dc", "f_rest", "lang_feat", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(np.asarray(getattr(st_c.params, name)),
                                   np.asarray(getattr(st_f.params, name)),
                                   atol=5e-5, err_msg=name)
    assert int(st_c.adam_step) == 1


def test_crop_render_pallas_interpret(rng):
    """The crop args feed the pallas compositing path too (strip height
    reaches composite_image_pallas): strip rows == full-render rows."""
    from legslam_tpu.ops.rasterize import render_arrays
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1,
                          max_span_y=4, chunk=32, tile_batch=2,
                          max_pairs=1 << 12, backend="pallas",
                          pallas_interpret=True)
    w, h = 128, 64
    st = _scene(rng, n=48, cap=64)
    view = simple_view(width=w, height=h, fx=60.0, fy=60.0)
    p = st.params
    sh = jnp.concatenate([p.f_dc, p.f_rest], axis=1)
    args = (p.xyz, sh, p.lang_feat, jax.nn.sigmoid(p.opacity[:, 0]),
            jnp.exp(p.scaling), p.rotation, st.valid, view.world_view,
            view.full_proj, view.cam_center, view.tan_fovx, view.tan_fovy,
            w, h, jnp.zeros(3), 0, cfg)
    full = render_arrays(*args, max_per_tile=64)
    assert int(full.overflow_pairs) == 0
    strips = [render_arrays(*args, max_per_tile=64,
                            crop_y=jnp.float32(y0), crop_h=32)
              for y0 in (0.0, 32.0)]
    c = np.concatenate([np.asarray(s.color) for s in strips])[:h]
    np.testing.assert_allclose(c, np.asarray(full.color), atol=1e-5)
    d = np.concatenate([np.asarray(s.depth) for s in strips])[:h]
    np.testing.assert_allclose(d, np.asarray(full.depth), atol=1e-5)


def test_spatial_batched_2d_mesh(rng):
    """views x strips 2D mesh (4 views x 2 strips on 8 devices): the
    combined step equals the DP batched step on the same batch."""
    from legslam_tpu.parallel.spatial import (make_mesh2d,
                                              spatial_batched_train_step,
                                              shard_batch_rows)
    assert len(jax.devices()) == 8
    mesh = make_mesh2d(4, 2)
    st = _scene(rng)
    views = [simple_view(width=W, height=H, fx=60.0, fy=60.0)
             for _ in range(4)]
    layout = spatial.spatial_layout(H, CFG.tile_h, 2)
    B = 4
    gt_color = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(B, H, W, 64)), jnp.float32)
    gt_depth = jnp.full((B, H, W), 2.5, jnp.float32)
    mask = jnp.ones((B, H, W), jnp.float32)
    batch = sharded.ViewBatch(
        world_view=jnp.stack([v.world_view for v in views]),
        full_proj=jnp.stack([v.full_proj for v in views]),
        cam_center=jnp.stack([v.cam_center for v in views]),
        tan_fovx=jnp.asarray([v.tan_fovx for v in views], jnp.float32),
        tan_fovy=jnp.asarray([v.tan_fovy for v in views], jnp.float32),
        gt_color=gt_color, gt_lang_feat=gt_lf, gt_depth=gt_depth,
        mask=mask)
    pad = lambda a: jax.vmap(lambda x: spatial.pad_rows(
        x, layout.h_padded))(a)
    batch_pad = batch._replace(gt_color=pad(gt_color),
                               gt_lang_feat=pad(gt_lf),
                               gt_depth=pad(gt_depth), mask=pad(mask))
    st_r = sharded.replicate_state(st, mesh)
    batch_pad = shard_batch_rows(batch_pad, mesh)
    cys = spatial.strip_offsets(layout)
    st_2d, aux_2d = spatial_batched_train_step(
        st_r, batch_pad, jnp.zeros(3), jnp.asarray(0.0), 1.0, cys,
        width=W, height=H, h_local=layout.h_local, active_sh_degree=0,
        opt=OPT, cfg=CFG, max_per_tile=128)
    st_dp, aux_dp = sharded.batched_train_step(
        st, batch, jnp.zeros(3), jnp.asarray(0.0), 1.0,
        width=W, height=H, active_sh_degree=0, opt=OPT, cfg=CFG,
        max_per_tile=128)
    np.testing.assert_allclose(float(aux_2d.loss), float(aux_dp.loss),
                               rtol=2e-6)
    np.testing.assert_allclose(np.asarray(aux_2d.color),
                               np.asarray(aux_dp.color), atol=1e-6)
    for name in ("xyz", "opacity", "scaling", "lang_feat"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_2d.params, name)),
            np.asarray(getattr(st_dp.params, name)),
            atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(st_2d.stats.denom),
                               np.asarray(st_dp.stats.denom), atol=0)
