"""Spatial (tile-row) sharded mapping: GaussianMapper(spatial_strips>1)
runs its one-keyframe-per-iteration loop with each strip of the image on
its own device (parallel/spatial.py). Step-level strip/loss parity is in
tests/test_spatial.py; this covers the mapper product path: scheduling,
binning cache, densify, convergence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import (
    MapperParams,
    OptimizationParams,
    RasterizeConfig,
)
from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.mapper.mapper import GaussianMapper
from legslam_tpu.ops import losses
from legslam_tpu.slam.trajectory import TrajectoryFrontend

# span caps cover the full tile grid so strip renders match the
# single-device render exactly (see parallel/spatial.py docstring)
CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1, max_span_y=4,
                      chunk=64, tile_batch=4)
OPT = OptimizationParams(
    densify_from_iter=10, densification_interval=25,
    opacity_reset_interval=0, iterations=200,
    position_lr_init=0.0016, position_lr_final=1.6e-5)


def _fed_mapper(tmp_path, strips, seed=5, refresh=1):
    ds = SyntheticDataset(n_frames=12, width=128, height=64,
                          n_gaussians=600, seed=seed, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=3,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics, opt=OPT,
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=CFG, capacity=1 << 13, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False, spatial_strips=strips,
        binning_refresh_interval=refresh)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    return ds, mapper


@pytest.mark.slow
def test_spatial_mapper_converges(tmp_path):
    assert len(jax.devices()) == 8
    ds, mapper = _fed_mapper(tmp_path, strips=8, refresh=4)
    assert mapper._mesh is not None and mapper._mesh.devices.size == 8
    mapper.run(max_iterations=20, tail_iterations=20)
    assert mapper.iteration >= 18
    kf = next(iter(mapper.keyframes.values()))
    out = mapper.render_from_pose(kf.R, kf.t, kf.views[-1].width,
                                  kf.views[-1].height)
    gt = kf.gt_color[-1]
    psnr = float(losses.psnr(out.color, gt))
    base = float(losses.psnr(gt * 0 + 0.5, gt))
    assert psnr > base + 2.0, (psnr, base)


def test_spatial_tick_matches_single_step(tmp_path):
    """One spatial iteration == one plain iteration: same keyframe, same
    update (strips partition pixels exactly)."""
    ds, m1 = _fed_mapper(tmp_path, strips=1, seed=7)
    ds2, m2 = _fed_mapper(tmp_path, strips=4, seed=7)
    for m in (m1, m2):
        m.drain_operations(limit=64)
        if not m.has_met_initial_conditions():
            pytest.skip("synthetic frontend produced too few keyframes")
        m.initialize_map()
    np.testing.assert_allclose(np.asarray(m1.state.params.xyz),
                               np.asarray(m2.state.params.xyz))
    fid = sorted(m1.keyframes)[0]
    m1._kf_cycle = [fid]
    m2._kf_cycle = [fid]
    m1.train_iteration()
    m2.train_iteration()
    for name in ("xyz", "opacity", "scaling"):
        np.testing.assert_allclose(
            np.asarray(getattr(m1.state.params, name)),
            np.asarray(getattr(m2.state.params, name)),
            atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(m1.state.stats.denom),
                               np.asarray(m2.state.stats.denom), atol=0)


def test_combined_axes_2d_mesh_tick(tmp_path):
    """n_views x spatial_strips: the mapper builds a ('data', 'strip')
    mesh and drains batched+strip ticks through
    spatial_batched_train_step."""
    ds = SyntheticDataset(n_frames=12, width=128, height=64,
                          n_gaussians=400, seed=5, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=3,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics, opt=OPT,
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=CFG, capacity=1 << 12, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False,
        n_views=2, spatial_strips=4)
    assert mapper._mesh is not None
    assert mapper._mesh.axis_names == ("data", "strip")
    assert mapper._mesh.devices.shape == (2, 4)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    mapper.drain_operations(limit=64)
    if not mapper.has_met_initial_conditions():
        pytest.skip("too few keyframes")
    mapper.initialize_map()
    for _ in range(3):
        mapper.train_iteration()
    jax.block_until_ready(mapper.state.params.xyz)
    assert np.isfinite(float(mapper._last_aux.loss))
    assert int(mapper.state.adam_step) == 3
