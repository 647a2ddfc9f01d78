"""EuRoC stereo loader + trajectory writers.

Parity targets: ORB-SLAM3/include/System.h:123 (SaveTrajectoryTUM /
SaveTrajectoryEuRoC / SaveTrajectoryKITTI output contracts) and the EuRoC
MAV ASL directory layout the reference's stereo examples consume.
"""
import os

import numpy as np
import pytest

from legslam_tpu.data.datasets import EuRoCStereoDataset, open_dataset
from legslam_tpu.utils.trajectory_io import (
    load_trajectory_tum,
    save_trajectory_euroc,
    save_trajectory_kitti,
    save_trajectory_tum,
)


def _random_c2ws(n, seed=0):
    rng = np.random.default_rng(seed)
    out, stamps = [], []
    for i in range(n):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0, 2 * np.pi)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                      [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        T = np.eye(4, dtype=np.float64)
        T[:3, :3], T[:3, 3] = R, rng.normal(size=3)
        out.append(T)
        stamps.append(1403636579.76 + 0.05 * i)
    return stamps, out


def test_tum_roundtrip(tmp_path):
    stamps, c2ws = _random_c2ws(7)
    p = str(tmp_path / "traj_tum.txt")
    save_trajectory_tum(p, stamps, c2ws)
    ls, lT = load_trajectory_tum(p)
    assert np.allclose(ls, stamps, atol=1e-5)
    for a, b in zip(lT, c2ws):
        assert np.allclose(a, b, atol=1e-5)


def test_euroc_format(tmp_path):
    stamps, c2ws = _random_c2ws(3, seed=1)
    p = str(tmp_path / "traj_euroc.txt")
    save_trajectory_euroc(p, stamps, c2ws)
    rows = [line.split() for line in open(p)]
    assert all(len(r) == 8 for r in rows)
    # nanosecond integer stamps, w-first unit quaternion
    assert int(rows[0][0]) == int(round(stamps[0] * 1e9))
    q = np.array([float(v) for v in rows[1][4:]])
    assert abs(np.linalg.norm(q) - 1.0) < 1e-5
    t = np.array([float(v) for v in rows[2][1:4]])
    assert np.allclose(t, c2ws[2][:3, 3], atol=1e-6)


def test_kitti_format(tmp_path):
    stamps, c2ws = _random_c2ws(4, seed=2)
    p = str(tmp_path / "traj_kitti.txt")
    save_trajectory_kitti(p, stamps, c2ws)
    rows = np.loadtxt(p).reshape(-1, 12)
    assert rows.shape[0] == 4
    M = rows[1].reshape(3, 4)
    assert np.allclose(M[:, :3], c2ws[1][:3, :3], atol=1e-7)
    assert np.allclose(M[:, 3], c2ws[1][:3, 3], atol=1e-7)


@pytest.fixture
def euroc_dir(tmp_path):
    pytest.importorskip("cv2")
    from tests.util import make_euroc_dir
    return make_euroc_dir(tmp_path)


def test_euroc_loader(euroc_dir):
    ds = open_dataset(euroc_dir)
    assert isinstance(ds, EuRoCStereoDataset)
    assert len(ds) == 5
    assert abs(ds.baseline - 0.11) < 1e-6
    assert ds.intrinsics["width"] == 64
    f = ds.read(2)
    assert f.color.shape == (48, 64, 3)
    assert f.color_right is not None
    assert f.color_right.shape == (48, 64, 3)
    assert f.depth is None
    # GT body pose -> cam0 c2w (T_BS = identity for cam0)
    assert np.allclose(f.c2w[:3, 3], [0.2, 0.04, 0.0], atol=1e-6)
    assert abs(f.timestamp - 1403636579.763555584 - 0.1) < 1e-6


def test_euroc_imu_between(euroc_dir):
    """imu0 windows: frame i gets the cam0-frame sample block covering
    (t_{i-1}, t_i], one anchor row before t_{i-1}, seconds + SI units —
    the frontend `imu=` contract (slam/imu.py preintegrate ZOH)."""
    ds = open_dataset(euroc_dir)
    assert ds.imu_between(0) is None
    blk = ds.imu_between(2)
    assert blk is not None and blk.shape[1] == 7
    t1, t2 = ds.read(1).timestamp, ds.read(2).timestamp
    assert blk[0, 0] <= t1 and blk[-1, 0] <= t2 + 1e-9
    assert blk[-1, 0] > t1
    # 50 ms gap at 200 Hz -> ~10-12 rows, strictly ascending stamps
    assert 8 <= blk.shape[0] <= 13
    assert np.all(np.diff(blk[:, 0]) > 0)
    # cam0 T_BS is identity -> samples pass through unrotated
    assert np.allclose(blk[:, 4:7], [0.1, 0.0, 9.81], atol=1e-9)
    assert np.allclose(blk[:, 1:4], [0.01, 0.0, -0.02], atol=1e-9)
