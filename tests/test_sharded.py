"""Data-parallel batched train step on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.parallel import sharded

from .util import simple_view

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=4,
                      chunk=32, tile_batch=2)
OPT = OptimizationParams()


def _batch(rng, views, h, w):
    B = len(views)
    return sharded.ViewBatch(
        world_view=jnp.stack([v.world_view for v in views]),
        full_proj=jnp.stack([v.full_proj for v in views]),
        cam_center=jnp.stack([v.cam_center for v in views]),
        tan_fovx=jnp.asarray([v.tan_fovx for v in views], jnp.float32),
        tan_fovy=jnp.asarray([v.tan_fovy for v in views], jnp.float32),
        gt_color=jnp.asarray(rng.uniform(size=(B, h, w, 3)), jnp.float32),
        gt_lang_feat=jnp.asarray(rng.normal(size=(B, h, w, 64)), jnp.float32),
        gt_depth=jnp.full((B, h, w), 2.5, jnp.float32),
        mask=jnp.ones((B, h, w), jnp.float32),
    )


def test_batched_step_on_mesh(rng):
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh(8)
    h, w = 32, 128
    pts = rng.normal(size=(96, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    st = G.create_from_pcd(pts, rng.uniform(size=(96, 3)).astype(np.float32),
                           capacity=128)
    views = [simple_view(width=w, height=h, fx=60.0, fy=60.0)
             for _ in range(8)]
    batch = _batch(rng, views, h, w)

    st = sharded.replicate_state(st, mesh)
    batch = sharded.shard_batch(batch, mesh)
    st2, aux = sharded.batched_train_step(
        st, batch, jnp.zeros(3), jnp.asarray(0.0), 1.0,
        width=w, height=h, active_sh_degree=0, opt=OPT, cfg=CFG,
        max_per_tile=128)
    assert np.isfinite(float(aux.loss))
    assert int(st2.adam_step) == 1
    # state stayed replicated and params moved
    assert not np.allclose(np.asarray(st2.params.xyz),
                           np.asarray(st.params.xyz))


def test_batched_matches_mean_of_losses(rng):
    """Batch-of-1 equals the single-view step's loss."""
    from legslam_tpu.mapper.train_step import train_step
    h, w = 32, 128
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 2.0
    st = G.create_from_pcd(pts, rng.uniform(size=(64, 3)).astype(np.float32),
                           capacity=64)
    view = simple_view(width=w, height=h, fx=60.0, fy=60.0)
    batch = _batch(rng, [view], h, w)
    _, aux_b = sharded.batched_train_step(
        st, batch, jnp.zeros(3), jnp.asarray(0.0), 1.0,
        width=w, height=h, active_sh_degree=0, opt=OPT, cfg=CFG,
        max_per_tile=128)
    _, aux_s = train_step(
        st, view.world_view, view.full_proj, view.cam_center,
        view.tan_fovx, view.tan_fovy, batch.gt_color[0],
        batch.gt_lang_feat[0], batch.gt_depth[0], batch.mask[0],
        jnp.zeros(3), jnp.asarray(0.0), 1.0,
        width=w, height=h, active_sh_degree=0, opt=OPT, cfg=CFG,
        max_per_tile=128)
    np.testing.assert_allclose(float(aux_b.loss), float(aux_s.loss),
                               rtol=1e-5)
