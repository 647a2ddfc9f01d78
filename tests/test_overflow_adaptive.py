"""Overflow-adaptive cap escalation (round-4 verdict weak #4).

The reference never drops rasterization pairs: rasterize_points.cu:29-35
resizes every buffer to num_rendered. Our static-shape equivalent is a
cap LADDER: when any static cap clips >0.1% of a view's pairs at a loss
sync, the mapper escalates that cap to the next rung (one re-jit per
rung, persisted by the compilation cache) instead of only warning; the
warning now fires only when no rung is left.

Pinned here:
  * unit-level: truncation drops raise max_pairs (pow2, ~2x headroom,
    bounded by the configured budget) and the capacity ladder respects
    the escalated floor; span drops double max_span_y then max_span_x
    up to the full tile grid; the warning only fires at the ceiling;
  * loop-level: a store whose footprints genuinely exceed the span cap
    escalates during training and reaches a warning-free exact state
    (span covers the grid => the clamped rect can no longer clip).
"""
import dataclasses
import warnings

import numpy as np
import pytest

from legslam_tpu.config import MapperParams, OptimizationParams, RasterizeConfig
from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.mapper.mapper import GaussianMapper
from legslam_tpu.slam.trajectory import TrajectoryFrontend

W, H = 256, 96   # tile grid: 2 x 6 tiles of 128 x 16


def _mapper(tmp_path, cfg, **kw):
    ds = SyntheticDataset(n_frames=13, width=W, height=H,
                          n_gaussians=1200, seed=3)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=4,
                                  max_corners=300)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics,
        opt=OptimizationParams(densify_from_iter=10_000,
                               opacity_reset_interval=0),
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=cfg, capacity=1 << 12, result_dir=str(tmp_path),
        max_per_tile=256, include_lang_feat=False, **kw)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    mapper.drain_operations(limit=64)
    mapper.initialize_map()
    return mapper


def test_unit_truncation_escalates_max_pairs(tmp_path):
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2,
                          max_span_y=2, chunk=64, tile_batch=4,
                          backend="pallas", pallas_interpret=True,
                          max_pairs=1 << 16)
    m = _mapper(tmp_path, cfg)
    # 70k pairs against the 65536 cap, budget ALREADY at its ceiling:
    # nothing to escalate -> the honest warning must still fire
    with pytest.warns(RuntimeWarning, match="no cap rung left"):
        m._respond_to_overflow(dropped=70_000 - 65_536, rendered=70_000)
    assert m.cfg.max_pairs == 1 << 16           # bounded by the budget
    # with a larger budget the same observation escalates to 2x headroom
    m._base_max_pairs = 1 << 20
    m._pairs_floor = 0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m._respond_to_overflow(dropped=70_000 - 65_536, rendered=70_000)
    assert m.cfg.max_pairs == 1 << 18, m.cfg.max_pairs   # 2*70k -> 2^18
    # the capacity ladder must not shrink below the escalated floor
    m._ladder_cfg(1024)
    assert m.cfg.max_pairs == 1 << 18


def test_unit_span_ladder_then_warn(tmp_path):
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1,
                          max_span_y=2, chunk=64, tile_batch=4,
                          backend="pallas", pallas_interpret=True,
                          max_pairs=1 << 16)
    m = _mapper(tmp_path, cfg)
    seen = []
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for _ in range(3):                      # 2->4->6 rows, 1->2 cols
            m._respond_to_overflow(dropped=100, rendered=1000)
            seen.append((m.cfg.max_span_x, m.cfg.max_span_y))
    assert seen == [(1, 4), (1, 6), (2, 6)], seen
    assert [i for i, _ in m.overflow_escalations] == [0, 0, 0]
    assert len(m.overflow_escalations) == 3   # observability log
    # grid fully covered (2 x 6): nothing left -> the warning fires
    with pytest.warns(RuntimeWarning, match="no cap rung left"):
        m._respond_to_overflow(dropped=100, rendered=1000)


def test_unit_xla_per_tile_rung(tmp_path):
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2,
                          max_span_y=6, chunk=64, tile_batch=4,
                          backend="xla", max_pairs=1 << 16)
    m = _mapper(tmp_path, cfg)
    assert m.max_per_tile == 256
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m._respond_to_overflow(dropped=100, rendered=1000)
    assert m.max_per_tile == 512                # span at ceiling -> tile cap
    assert (m.cfg.max_span_x, m.cfg.max_span_y) == (2, 6)


@pytest.mark.slow
def test_loop_escalates_to_exact(tmp_path):
    """Genuine span overflow in the training loop: inflate every scale
    so footprints exceed the 1x2 span cap, then train through syncs —
    the mapper must escalate (warning-free) until drops fall under the
    0.1% guardrail. The ladder stops at the first sufficient rung, NOT
    at full grid coverage — escalation is demand-driven."""
    import jax.numpy as jnp
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=1,
                          max_span_y=2, chunk=64, tile_batch=4,
                          backend="xla", max_pairs=1 << 16)
    m = _mapper(tmp_path, cfg, binning_refresh_interval=4,
                capacity_ladder=False)
    st = m.state
    # ~40 px footprints: span_y ~ 6 tiles of 16 px, far over the 2-row cap
    m.state = st.replace(params=st.params.replace(
        scaling=jnp.maximum(st.params.scaling, np.log(0.35))))
    m._invalidate_binning()
    m.loss_sync_interval = 5
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        for _ in range(40):
            m.train_iteration()
    # the ladder moved (initial caps could not hold these footprints) ...
    assert m.cfg.max_span_y > 2, m.cfg
    # ... and stopped at a rung where drops are under the 0.1% guardrail
    _, dropped, rendered, _ = np.asarray(m._last_aux.sync3)
    assert rendered > 0
    assert dropped / max(rendered, 1) <= 1e-3, (dropped, rendered)
