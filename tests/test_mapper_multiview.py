"""Multi-view batched mapping: GaussianMapper(n_views>1) drains N
keyframes per tick through parallel/sharded.batched_train_step on the
8-device virtual CPU mesh.

This is the mapper-level integration of the TPU-native scaling axis (the
reference's gaussian_mapper.cpp:624-798 loop is strictly one KF per
iteration on one GPU); step-level per-view densify-stat parity is covered
in tests/test_sharded.py.
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

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)
OPT = OptimizationParams(
    densify_from_iter=10, densification_interval=25,
    opacity_reset_interval=0, iterations=200,
    position_lr_init=0.0016, position_lr_final=1.6e-5)


def _fed_mapper(tmp_path, n_views, seed=5):
    ds = SyntheticDataset(n_frames=12, width=128, height=64,
                          n_gaussians=600, seed=seed, clutter_ratio=0.0)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=3,
                                  max_corners=200)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics, opt=OPT,
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=CFG, capacity=1 << 13, result_dir=str(tmp_path),
        max_per_tile=512, include_lang_feat=False, n_views=n_views)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    return ds, mapper


@pytest.mark.slow
def test_multiview_mapper_converges(tmp_path):
    assert len(jax.devices()) == 8
    ds, mapper = _fed_mapper(tmp_path, n_views=4)
    assert mapper._mesh is not None and mapper._mesh.devices.size == 4
    mapper.run(max_iterations=20, tail_iterations=20)
    assert mapper.iteration >= 18
    # every tick drains n_views keyframe uses
    used = sum(kf.record.get("used", 0) for kf in mapper.keyframes.values())
    assert used >= mapper.iteration * 4
    kf = next(iter(mapper.keyframes.values()))
    out = mapper.render_from_pose(kf.R, kf.t, kf.views[-1].width,
                                  kf.views[-1].height)
    gt = kf.gt_color[-1]
    psnr = float(losses.psnr(out.color, gt))
    base = float(losses.psnr(gt * 0 + 0.5, gt))
    assert psnr > base + 2.0, (psnr, base)


def test_batched_tick_b1_matches_single_step(tmp_path):
    """A 1-view batched tick must reproduce the single-view step: same
    keyframe schedule, numerically close parameters afterwards."""
    ds, m1 = _fed_mapper(tmp_path, n_views=1, seed=7)
    ds2, m2 = _fed_mapper(tmp_path, n_views=1, seed=7)
    m2.n_views = 2
    m2._mesh = None  # single-device batched path (vmap of size 2)
    # drain frontend ops and initialize both maps identically
    for m in (m1, m2):
        m.drain_operations(limit=64)
        if not m.has_met_initial_conditions():
            pytest.skip("synthetic frontend produced too few keyframes")
        m.initialize_map()
    np.testing.assert_allclose(np.asarray(m1.state.params.xyz),
                               np.asarray(m2.state.params.xyz))
    # one batched tick with both views = the SAME keyframe vs two
    # single-view steps of that keyframe: the mean-of-views gradient
    # equals the per-view gradient, so tick 1 must match step 1 exactly
    # (Adam is deterministic); afterwards they diverge (1 vs 2 updates).
    fid = sorted(m1.keyframes)[0]
    m1._kf_cycle = [fid]
    m2._kf_cycle = [fid, fid]
    m1.train_iteration()
    m2.train_iteration()
    a = np.asarray(m1.state.params.xyz)
    b = np.asarray(m2.state.params.xyz)
    np.testing.assert_allclose(a, b, atol=5e-5)
    # densify stats: the batched tick visited the KF twice -> denom is
    # doubled relative to the single step
    d1 = float(jnp.sum(m1.state.stats.denom))
    d2 = float(jnp.sum(m2.state.stats.denom))
    assert d1 > 0
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-4)
