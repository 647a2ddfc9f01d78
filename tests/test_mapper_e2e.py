"""End-to-end slice: synthetic RGB-D sequence -> trajectory frontend ->
online mapper -> improving PSNR -> save/load artifacts."""
import os

import numpy as np
import pytest

from legslam_tpu.config import MapperParams, OptimizationParams, RasterizeConfig
from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.mapper.mapper import GaussianMapper
from legslam_tpu.ops import losses
from legslam_tpu.slam.trajectory import TrajectoryFrontend

pytestmark = pytest.mark.slow  # e2e training: minutes on CPU

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    ds = SyntheticDataset(n_frames=24, width=256, height=96,
                          n_gaussians=1500, seed=3)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=4,
                                  max_corners=400)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics,
        opt=OptimizationParams(
            densify_from_iter=10, densification_interval=40,
            opacity_reset_interval=0, iterations=200,
            position_lr_init=0.0016, position_lr_final=1.6e-5),
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=CFG, capacity=1 << 14,
        result_dir=str(tmp_path_factory.mktemp("out")),
        max_per_tile=512, include_lang_feat=False)

    lf = None
    for frame in ds:
        frontend.track(frame, lf_image=lf)
    frontend.finish()
    # frontend is already finished (offline feed), so phase 2 exits at once
    # and the tail phase carries the optimization (keep-training semantics,
    # gaussian_mapper.cpp:538-546)
    mapper.run(max_iterations=120, tail_iterations=120)
    return ds, mapper


def test_map_converges(trained):
    ds, mapper = trained
    assert mapper.iteration >= 100
    assert int(mapper.state.num_valid()) > 100
    # rendered PSNR on a training keyframe should beat a gray image
    kf = next(iter(mapper.keyframes.values()))
    out = mapper.render_from_pose(kf.R, kf.t, kf.views[-1].width,
                                  kf.views[-1].height)
    gt = kf.gt_color[-1]
    psnr = float(losses.psnr(out.color, gt))
    base = float(losses.psnr(gt * 0 + 0.5, gt))
    assert psnr > base + 3.0, (psnr, base)


def test_artifacts_roundtrip(trained):
    ds, mapper = trained
    base = mapper.save("experiment")
    assert os.path.exists(os.path.join(base, "point_cloud",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(base, "cameras.json"))
    from legslam_tpu.utils.ply import load_gaussian_ply
    back = load_gaussian_ply(
        os.path.join(base, "point_cloud", "point_cloud.ply"))
    assert back["xyz"].shape[0] == int(mapper.state.num_valid())

    metrics = mapper.record_keyframe_metrics("experiment")
    assert metrics["psnr"] > 10.0
