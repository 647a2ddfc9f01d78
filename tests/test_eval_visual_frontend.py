"""run_scene with the visual tracking frontend: ATE must be real.

VERDICT r1 flagged the Replica harness's ATE as vacuous (est == gt by
construction with the GT-pose frontend). With frontend="visual" the GT
poses are withheld from the tracker, so ate_rmse measures actual KLT+RANSAC
tracking drift — nonzero, but small on the clean synthetic scene — while
the photometric metrics still land (the mapper trains on tracked poses).
Mirrors the reference setup: ORB-SLAM3 estimates poses; eval scores them
against GT (eval/replica_test.py:29-46).
"""
import numpy as np
import pytest

from legslam_tpu.config import (MapperParams, OptimizationParams,
                                RasterizeConfig)
from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.eval_harness import replica_eval

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)


@pytest.mark.slow
def test_visual_frontend_ate_nonvacuous(tmp_path, monkeypatch):
    # the gentle-motion regime the tracker is validated in
    # (tests/test_tracking.py): 256x144, slow orbit, surface-only scene
    ds = SyntheticDataset(n_frames=16, width=256, height=144,
                          n_gaussians=7000, revolutions=0.12,
                          clutter_ratio=0.0)
    monkeypatch.setattr(replica_eval, "open_dataset", lambda path: ds)

    r = replica_eval.run_scene(
        "synthetic", str(tmp_path / "out"),
        opt=OptimizationParams(densify_from_iter=10,
                               densification_interval=40,
                               opacity_reset_interval=0, iterations=200),
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=2),
        cfg=CFG, capacity=1 << 14, iterations_per_frame=1,
        frontend="visual",
        frontend_kwargs=dict(ransac_thresh=0.1))
    # non-vacuous: the tracker drifts a little...
    assert r["ate_rmse"] > 1e-6, r
    # ...but tracks: the standalone-tracker bar is 0.05 (test_tracking.py);
    # allow slack for the shorter sequence
    assert r["ate_rmse"] < 0.2, r
    assert np.isfinite(r["psnr"]) and r["psnr"] > 10.0, r
    assert r["n_gaussians"] > 0
