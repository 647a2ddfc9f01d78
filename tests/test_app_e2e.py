"""End-to-end CLI acceptance over ON-DISK dataset layouts.

The reference's de-facto acceptance tests spawn the trained binary over a
Replica scene directory and score the artifacts (eval/replica_test.py:
92-129). No real Replica/ScanNet data is mounted in this environment, so
these tests materialize a tiny synthetic scene in the EXACT on-disk
layouts the loaders contract to (SURVEY.md §3.6 / examples/
replica_rgbd.cpp:223-257) — `results/frame*.jpg + depth*.png + traj.txt`
for Replica, `color/N.jpg + depth/N.png + pose/N.txt + intrinsic/` for
ScanNet — and then drive the real CLI `main()` end to end, checking every
artifact a reference run produces (experiment/ply tree, trajectories in
all three formats, TrackingTime.txt, per-KF metric files).
"""
import json
import os

import numpy as np
import pytest

from legslam_tpu.data.synthetic import SyntheticDataset

N_FRAMES = 10
W, H = 160, 96

# CPU-budget knobs: tiny chunks/spans + a short densify tail via the
# mapper YAML below (the default 0.8 * densification_interval tail is 80
# iterations — minutes of XLA-CPU compositing)
FAST_ARGS = ["--kf-stride", "2", "--capacity", "4096", "--no-lf",
             "--iters-per-frame", "1", "--binning-refresh", "1",
             "--chunk", "64", "--tile-batch", "4", "--max-per-tile", "512",
             "--max-span-x", "3", "--max-span-y", "8"]

MAPPER_YAML = """%YAML:1.0
Optimization.densification_interval: 20
Optimization.densify_from_iter: 8
Mapper.min_num_initial_map_kfs: 4
Mapper.new_keyframe_times_of_use: 4
"""


@pytest.fixture(scope="module")
def mapper_yaml(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "tiny_rgbd.yaml"
    p.write_text(MAPPER_YAML)
    return str(p)


@pytest.fixture(scope="module")
def frames():
    ds = SyntheticDataset(n_frames=N_FRAMES, width=W, height=H,
                          n_gaussians=2500, seed=7, clutter_ratio=0.0,
                          revolutions=0.2)
    return [ds.read(i) for i in range(N_FRAMES)], ds.intrinsics


def _write_jpg(path, color01):
    import cv2
    bgr = cv2.cvtColor((color01 * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
    assert cv2.imwrite(path, bgr, [cv2.IMWRITE_JPEG_QUALITY, 95])


def _write_depth_png(path, depth_m, scale):
    import cv2
    d = np.clip(depth_m * scale, 0, 65535).astype(np.uint16)
    assert cv2.imwrite(path, d)


@pytest.fixture(scope="module")
def replica_scene(frames, tmp_path_factory):
    """<scene>/results/frameNNNN.jpg + depthNNNN.png + traj.txt."""
    from legslam_tpu.data.datasets import REPLICA_DEPTH_SCALE
    fr, _ = frames
    scene = tmp_path_factory.mktemp("replica_office_tiny")
    res = scene / "results"
    res.mkdir()
    rows = []
    for f in fr:
        _write_jpg(str(res / f"frame{f.index:06d}.jpg"), f.color)
        _write_depth_png(str(res / f"depth{f.index:06d}.png"), f.depth,
                         REPLICA_DEPTH_SCALE)
        rows.append(f.c2w.reshape(-1))
    np.savetxt(str(scene / "traj.txt"), np.stack(rows))
    return scene


@pytest.fixture(scope="module")
def scannet_scene(frames, tmp_path_factory):
    """<scene>/color/N.jpg + depth/N.png + pose/N.txt + intrinsic/."""
    from legslam_tpu.data.datasets import SCANNET_DEPTH_SCALE
    fr, intr = frames
    scene = tmp_path_factory.mktemp("scannet_scene_tiny")
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scene / sub).mkdir()
    for f in fr:
        _write_jpg(str(scene / "color" / f"{f.index}.jpg"), f.color)
        _write_depth_png(str(scene / "depth" / f"{f.index}.png"), f.depth,
                         SCANNET_DEPTH_SCALE)
        np.savetxt(str(scene / "pose" / f"{f.index}.txt"), f.c2w)
    K = np.eye(4)
    K[0, 0], K[1, 1] = intr["fx"], intr["fy"]
    K[0, 2], K[1, 2] = intr["cx"], intr["cy"]
    np.savetxt(str(scene / "intrinsic" / "intrinsic_color.txt"), K)
    return scene


def _check_run_artifacts(out, n_frames):
    base = os.path.join(out, "experiment", "ply")
    pc = os.path.join(base, "point_cloud", "point_cloud.ply")
    assert os.path.exists(pc)
    from legslam_tpu.utils import ply
    data = ply.load_gaussian_ply(pc)
    assert data["xyz"].shape[0] > 100
    assert data["lang_feat"].shape[1] == 64
    assert os.path.exists(os.path.join(base, "input.ply"))
    assert os.path.exists(os.path.join(base, "cfg_args"))
    with open(os.path.join(base, "cameras.json")) as f:
        cams = json.load(f)
    assert len(cams) >= 2 and {"fx", "position", "rotation"} <= set(cams[0])
    with open(os.path.join(out, "TrackingTime.txt")) as f:
        assert len(f.readlines()) == n_frames
    tum = np.loadtxt(os.path.join(out, "CameraTrajectory_TUM.txt"))
    assert tum.shape == (len(cams), 8)
    kitti = np.loadtxt(os.path.join(out, "CameraTrajectory_KITTI.txt"))
    assert kitti.shape == (len(cams), 12)
    assert os.path.exists(os.path.join(out, "CameraTrajectory_EuRoC.txt"))
    exp = os.path.join(out, "experiment")
    psnrs = np.loadtxt(os.path.join(exp, "psnr_gaussian_splatting.txt"))
    assert os.path.exists(os.path.join(exp, "dssim.txt"))
    assert os.path.exists(os.path.join(exp, "render_time.txt"))
    return float(np.mean(np.atleast_1d(psnrs)))


@pytest.mark.slow
def test_replica_layout_cli_end_to_end(replica_scene, mapper_yaml,
                                       tmp_path, capsys):
    from legslam_tpu.apps.replica_rgbd import main
    from legslam_tpu.data.datasets import ReplicaDataset, open_dataset
    assert isinstance(open_dataset(str(replica_scene)), ReplicaDataset)
    out = str(tmp_path / "run")
    main(["--data", str(replica_scene), "--out", out,
          "--cfg", mapper_yaml] + FAST_ARGS)
    text = capsys.readouterr().out
    assert "Average FPS:" in text and "Total time:" in text
    psnr = _check_run_artifacts(out, N_FRAMES)
    # jpg-lossy GT, ~26 iterations total: loose floor — the check is that
    # training ran and rendered something resembling the inputs
    assert psnr > 12.0, psnr


CAMERA_YAML_TMPL = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {fx}
Camera1.fy: {fy}
Camera1.cx: {cx}
Camera1.cy: {cy}
Camera.width: {w}
Camera.height: {h}
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1,0,0,{b}, 0,1,0,0, 0,0,1,0, 0,0,0,1]
"""


@pytest.mark.slow
def test_euroc_stereo_cli_end_to_end(mapper_yaml, tmp_path):
    """EuRoC ASL layout driven through `--frontend visual --sensor stereo
    --camera-cfg` — the stereo sensor mode runs off the config contract
    (camera yaml supplies intrinsics + the T_c1_c2 baseline) like RGB-D
    does (reference cfg/ORB_SLAM3/Stereo/EuRoC; VERDICT r3 #8)."""
    from legslam_tpu.apps.replica_rgbd import main
    from legslam_tpu.data.datasets import EuRoCStereoDataset, open_dataset
    from tests.util import make_euroc_dir

    # synthetic rectified stereo pairs: left renders + disparity warp
    # (fx*b/z must land inside the SGM search window, like EuRoC's
    # fx=458/b=0.11 at room depth)
    baseline = 0.5
    ds = SyntheticDataset(n_frames=N_FRAMES, width=256, height=144,
                          n_gaussians=6000, seed=11, clutter_ratio=0.0,
                          revolutions=0.15)
    fx = ds.intrinsics["fx"]
    frames = []
    # _right_view warps at its module BASELINE (0.5) — keep ours equal
    from tests.test_tracking_stereo import BASELINE as _warp_baseline
    from tests.test_tracking_stereo import _right_view
    assert _warp_baseline == baseline
    for fr in ds:
        right = _right_view(fr.color, fr.depth, fx)
        frames.append((fr.color, right, fr.c2w))
    scene = make_euroc_dir(tmp_path, n=N_FRAMES, width=256, height=144,
                           baseline=baseline, frames=frames,
                           intrinsics=(fx, ds.intrinsics["fy"],
                                       ds.intrinsics["cx"],
                                       ds.intrinsics["cy"]),
                           distortion=(0.0, 0.0, 0.0, 0.0))
    assert isinstance(open_dataset(scene), EuRoCStereoDataset)
    cam_yaml = tmp_path / "stereo_cam.yaml"
    cam_yaml.write_text(CAMERA_YAML_TMPL.format(
        fx=fx, fy=ds.intrinsics["fy"], cx=ds.intrinsics["cx"],
        cy=ds.intrinsics["cy"], w=256, h=144, b=baseline))
    out = str(tmp_path / "run")
    main(["--data", scene, "--out", out, "--cfg", mapper_yaml,
          "--camera-cfg", str(cam_yaml), "--frontend", "visual",
          "--sensor", "stereo"] + FAST_ARGS)
    # a map was built from SGM-recovered depth and artifacts exist
    base = os.path.join(out, "experiment", "ply")
    from legslam_tpu.utils import ply
    data = ply.load_gaussian_ply(
        os.path.join(base, "point_cloud", "point_cloud.ply"))
    assert data["xyz"].shape[0] > 100
    assert os.path.exists(os.path.join(out, "CameraTrajectory_TUM.txt"))


@pytest.mark.slow
def test_scannet_layout_cli_end_to_end(scannet_scene, mapper_yaml,
                                       tmp_path):
    from legslam_tpu.apps.replica_rgbd import main
    from legslam_tpu.data.datasets import ScanNetDataset, open_dataset
    ds = open_dataset(str(scannet_scene))
    assert isinstance(ds, ScanNetDataset)
    # intrinsics must come from intrinsic_color.txt, not the fallback
    assert abs(ds.intrinsics["fx"] - 0.8 * W) < 1e-3
    out = str(tmp_path / "run")
    main(["--data", str(scannet_scene), "--out", out,
          "--cfg", mapper_yaml] + FAST_ARGS)
    _check_run_artifacts(out, N_FRAMES)
