"""Training step: loss decreases, stats accumulate, schedules behave."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.mapper.train_step import train_step, upsample_lf
from legslam_tpu.models import gaussians as G

from .util import simple_view

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)
OPT = OptimizationParams(position_lr_init=0.0016, position_lr_final=1.6e-5)


def _setup(rng, n=256, cap=512, w=128, h=64):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
    pts[:, 2] = np.abs(pts[:, 2]) + 2.5
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=cap)
    view = simple_view(width=w, height=h, fx=100.0, fy=100.0)
    gt_color = jnp.asarray(rng.uniform(size=(h, w, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(h, w, 64)), jnp.float32)
    gt_depth = jnp.full((h, w), 2.5, jnp.float32)
    mask = jnp.ones((h, w), jnp.float32)
    return st, view, gt_color, gt_lf, gt_depth, mask


def test_loss_decreases(rng):
    st, view, gt_color, gt_lf, gt_depth, mask = _setup(rng)
    bg = jnp.zeros(3)
    losses_seen = []
    for i in range(6):
        st, aux = train_step(
            st, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
            bg, jnp.asarray(min(i, 24), jnp.float32), 1.0,
            width=view.width, height=view.height, active_sh_degree=0,
            opt=OPT, cfg=CFG, max_per_tile=512)
        losses_seen.append(float(aux.loss))
    assert all(math.isfinite(x) for x in losses_seen)
    assert losses_seen[-1] < losses_seen[0]
    # adam stepped 6 times
    assert int(st.adam_step) == 6
    # densify stats accumulated for visible gaussians
    assert float(jnp.sum(st.stats.denom)) > 0
    assert float(jnp.max(st.stats.max_radii2d)) > 0


def test_invalid_slots_untouched(rng):
    st, view, gt_color, gt_lf, gt_depth, mask = _setup(rng, n=64, cap=128)
    bg = jnp.zeros(3)
    before = np.asarray(st.params.xyz[64:])
    st2, _ = train_step(
        st, view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
        bg, jnp.asarray(0.0), 1.0,
        width=view.width, height=view.height, active_sh_degree=0,
        opt=OPT, cfg=CFG, max_per_tile=256)
    np.testing.assert_allclose(np.asarray(st2.params.xyz[64:]), before)


def test_upsample_lf():
    lf = jnp.ones((37, 37, 8))
    up = upsample_lf(lf, 64, 128)
    assert up.shape == (64, 128, 8)
    np.testing.assert_allclose(np.asarray(up), 1.0, rtol=1e-5)
