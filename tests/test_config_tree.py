"""Config tree (C30): OpenCV-YAML parsing into typed params and camera
intrinsics, and that the shipped cfg/ files reproduce the reference's
values (gaussian_mapper.cpp:223-359 read sites)."""
import os

import numpy as np

from legslam_tpu.config import (
    MapperParams,
    OptimizationParams,
    intrinsics_from_yaml,
    load_opencv_yaml,
    load_run_config,
    mapper_params_from_yaml,
    optimization_from_yaml,
)

CFG = os.path.join(os.path.dirname(__file__), "..", "cfg")


def test_replica_scene_yaml_values():
    d = load_opencv_yaml(
        os.path.join(CFG, "gaussian_mapper/RGB-D/Replica/office0.yaml"))
    opt = optimization_from_yaml(d)
    assert opt.iterations == 30100
    assert opt.position_lr_init == 0.00032
    assert opt.position_lr_final == 0.00016  # per-scene delta
    assert opt.position_lr_max_steps == 24
    assert opt.densify_grad_threshold == 0.001
    assert opt.densify_from_iter == 600
    assert opt.opacity_reset_interval == 0
    assert opt.sh_degree == 3
    # no YAML key for the LF lr: ctor default 0.0015
    # (gaussian_parameters.h:65)
    assert opt.lang_feature_lr == 0.0015

    mp = mapper_params_from_yaml(d)
    assert mp.min_num_initial_map_kfs == 10
    assert mp.new_keyframe_times_of_use == 8
    assert mp.loop_closure_increased_times_of_use == 2
    assert mp.num_gaus_pyramid_sub_levels == 3  # per-scene delta
    assert mp.gaus_pyramid_times_of_use == (8, 8, 8)
    assert mp.do_inactive_geo_densify is True
    assert mp.cull_keyframes is False
    assert mp.rgbd_max_depth == 40.0
    assert mp.position_lr_max_steps_slam == 24


def test_scannet_and_tum_deltas():
    d = load_opencv_yaml(
        os.path.join(CFG, "gaussian_mapper/RGB-D/ScanNet/scannet.yaml"))
    opt = optimization_from_yaml(d)
    mp = mapper_params_from_yaml(d)
    assert opt.iterations == 50100
    assert opt.percent_dense == 0.005
    assert opt.opacity_reset_interval == 5000
    assert mp.depth_cache == 20
    assert mp.new_keyframe_times_of_use == 16
    assert mp.gaus_pyramid_times_of_use == (16, 16)

    d = load_opencv_yaml(
        os.path.join(CFG, "gaussian_mapper/RGB-D/TUM/tum_rgbd.yaml"))
    mp = mapper_params_from_yaml(d)
    assert mp.new_keyframe_times_of_use == 2
    assert mp.large_rot_th == 30.0
    assert mp.large_trans_th == 1.0


def test_camera_yaml_intrinsics():
    d = load_opencv_yaml(
        os.path.join(CFG, "camera/RGB-D/TUM/tum_freiburg1_desk.yaml"))
    intr = intrinsics_from_yaml(d)
    assert intr["width"] == 640 and intr["height"] == 480
    np.testing.assert_allclose(intr["fx"], 517.306408)
    assert intr["depth_scale"] == 5000.0
    # fr1 has strong distortion -> coeffs present and the undistortion
    # machinery engages
    assert "dist_coeffs" in intr and intr["dist_coeffs"][0] != 0.0
    from legslam_tpu.utils.undistort import build_undistortion
    assert build_undistortion(intr) is not None

    d = load_opencv_yaml(
        os.path.join(CFG, "camera/RGB-D/Replica/office0.yaml"))
    intr = intrinsics_from_yaml(d)
    assert intr["fx"] == 600.0 and intr["cx"] == 599.5
    assert intr["depth_scale"] == 6553.5
    assert "dist_coeffs" not in intr  # all-zero -> pinhole fast path


def test_mono_and_stereo_camera_yamls():
    """Mono/Stereo sensor trees run off the config contract like RGB-D
    (reference cfg/ORB_SLAM3/{Monocular,Stereo}; VERDICT r3 missing #4)."""
    d = load_opencv_yaml(
        os.path.join(CFG, "camera/Monocular/Replica/replica_mono.yaml"))
    intr = intrinsics_from_yaml(d)
    assert intr["width"] == 1200 and intr["fx"] == 600.0
    assert "depth_scale" not in intr          # monocular: no depth factor
    assert "dist_coeffs" in intr              # reference mono yaml has k1

    d = load_opencv_yaml(os.path.join(CFG, "camera/Stereo/euroc.yaml"))
    # !!opencv-matrix block parses into a [4,4] array
    T = d["Stereo.T_c1_c2"]
    assert T.shape == (4, 4) and abs(T[0, 0] - 0.999997256477797) < 1e-12
    intr = intrinsics_from_yaml(d)
    assert intr["width"] == 752 and intr["height"] == 480
    # baseline derived from ||T_c1_c2 translation|| (EuRoC ~11 cm)
    np.testing.assert_allclose(intr["stereo_baseline"], 0.110077842,
                               atol=1e-6)


def test_load_run_config_and_defaults_roundtrip():
    opt, mp, intr = load_run_config(
        os.path.join(CFG, "gaussian_mapper/RGB-D/Replica/replica_rgbd.yaml"),
        os.path.join(CFG, "camera/RGB-D/Replica/office0.yaml"))
    assert isinstance(opt, OptimizationParams)
    assert isinstance(mp, MapperParams)
    assert intr["width"] == 1200
    # missing keys keep dataclass defaults (the "flag defaults" contract)
    empty_opt = optimization_from_yaml({})
    assert empty_opt == OptimizationParams()
    assert mapper_params_from_yaml({}) == MapperParams()


def test_all_shipped_yamls_parse():
    count = 0
    for root, _, files in os.walk(CFG):
        for fn in files:
            if fn.endswith(".yaml"):
                d = load_opencv_yaml(os.path.join(root, fn))
                assert d, fn
                count += 1
    assert count >= 25
