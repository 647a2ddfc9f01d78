"""Shared test helpers: random scenes and cameras."""
import numpy as np

from legslam_tpu.utils.camera import CameraView


def random_scene(rng, n, capacity=None, lf_dim=8, sh_k=16, spread=1.0,
                 center=(0.0, 0.0, 4.0)):
    """Random gaussian cloud in front of a canonical camera at origin."""
    capacity = capacity or n
    means = rng.normal(size=(capacity, 3)).astype(np.float32) * spread
    means += np.asarray(center, np.float32)
    sh = rng.normal(size=(capacity, sh_k, 3)).astype(np.float32) * 0.3
    sh[:, 0] += 0.8
    lf = rng.normal(size=(capacity, lf_dim)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.95, size=(capacity,)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.0, size=(capacity, 3))).astype(
        np.float32)
    quats = rng.normal(size=(capacity, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    valid = np.zeros((capacity,), bool)
    valid[:n] = True
    return dict(means3d=means, sh=sh, lang_feat=lf, opacity=opacity,
                scales=scales, quats=quats, valid=valid)


def simple_view(width=160, height=96, fx=120.0, fy=120.0):
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, dtype=np.float32)
    return CameraView.create(R, t, width, height, fx=fx, fy=fy)


def make_euroc_dir(root, n=5, width=64, height=48, baseline=0.11,
                   frames=None, intrinsics=None, with_imu=True, seed=3,
                   distortion=(-0.28, 0.07, 0.0002, 0.00002)):
    """Materialize a tiny EuRoC MAV ASL layout (<root>/mav0/{cam0,cam1,
    imu0,state_groundtruth_estimate0}) — the on-disk contract of
    data/datasets.EuRoCStereoDataset. `frames` (optional) is a list of
    (color_left [H,W,3] f32, color_right, c2w [4,4]) tuples; default is
    random noise with a linear-translation GT."""
    import os

    import cv2

    mav = root / "seq" / "mav0"
    rng = np.random.default_rng(seed)
    t0 = 1403636579763555584
    if intrinsics is None:
        intrinsics = (458.654, 457.296, 367.215, 248.375)
    for ci, cam in enumerate(("cam0", "cam1")):
        d = mav / cam / "data"
        os.makedirs(d)
        with open(mav / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(n):
                ts = t0 + i * 50_000_000 + (7 if cam == "cam1" else 0)
                name = f"{ts}.png"
                if frames is not None:
                    img01 = frames[i][ci]
                    img = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
                    img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                else:
                    img = (rng.uniform(0, 255, size=(height, width, 3))
                           .astype(np.uint8))
                cv2.imwrite(str(d / name), img)
                f.write(f"{ts},{name}\n")
        with open(mav / cam / "sensor.yaml", "w") as f:
            off = baseline if cam == "cam1" else 0.0
            f.write(
                "sensor_type: camera\n"
                "T_BS:\n  rows: 4\n  cols: 4\n"
                f"  data: [1,0,0,{off}, 0,1,0,0, 0,0,1,0, 0,0,0,1]\n"
                f"resolution: [{width}, {height}]\n"
                f"intrinsics: [{intrinsics[0]}, {intrinsics[1]}, "
                f"{intrinsics[2]}, {intrinsics[3]}]\n"
                f"distortion_coefficients: {list(distortion)}\n")
    gt = mav / "state_groundtruth_estimate0"
    os.makedirs(gt)
    with open(gt / "data.csv", "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for i in range(n):
            ts = t0 + i * 50_000_000
            if frames is not None:
                c2w = frames[i][2]
                from legslam_tpu.utils.trajectory_io import _rot_to_quat
                q = _rot_to_quat(c2w[:3, :3])
                f.write(f"{ts},{c2w[0, 3]},{c2w[1, 3]},{c2w[2, 3]},"
                        f"{q[0]},{q[1]},{q[2]},{q[3]}\n")
            else:
                f.write(f"{ts},{0.1 * i},{0.02 * i},0.0,1,0,0,0\n")
    if with_imu:
        imu = mav / "imu0"
        os.makedirs(imu)
        with open(imu / "data.csv", "w") as f:
            f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
            for k in range(9 * n):       # 200 Hz-ish spanning all frames
                ts = t0 - 10_000_000 + k * 5_000_000
                f.write(f"{ts},0.01,0.0,-0.02,0.1,0.0,9.81\n")
    return str(root / "seq")
