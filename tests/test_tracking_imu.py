"""Inertial tracking variants (C17 scope): IMU preintegration, the
closed-form visual-inertial initialization, and the mono-/rgbd-inertial
frontend modes.

Reference behaviors covered: IMU::Preintegrated::IntegrateNewMeasurement
(ORB-SLAM3/src/ImuTypes.cc), LocalMapping::InitializeIMU gravity/scale
estimation with its ScaleRefinement push (src/LocalMapping.cc:1300-1304),
and Tracking::PredictStateIMU (IMU prediction seeding pose solves and
dead-reckoning through RECENTLY_LOST).
"""
import dataclasses

import numpy as np
import pytest

from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.eval_harness.metrics import ate_rmse
from legslam_tpu.slam import imu as I
from legslam_tpu.slam.interface import OpKind
from legslam_tpu.slam.tracking import TrackingFrontend


def test_preintegrate_constant_motion_analytic():
    """Constant body rate + constant world acceleration, zero gravity:
    preintegrated deltas must match the closed-form double integral."""
    w = np.array([0.0, 0.0, 0.4])         # yaw rate
    a_w = np.array([0.3, -0.1, 0.05])     # world-frame acceleration
    rate, T = 400.0, 1.0
    ts = np.arange(0.0, T + 0.5 / rate, 1.0 / rate)
    rows = np.zeros((len(ts), 7))
    rows[:, 0] = ts
    R = np.eye(3)
    for k, t in enumerate(ts):
        R = I.exp_so3(w * t)
        rows[k, 1:4] = w
        rows[k, 4:7] = R.T @ a_w          # specific force, g = 0
    pre = I.preintegrate(rows)
    assert abs(pre.dt - T) < 1e-9
    np.testing.assert_allclose(pre.dR, I.exp_so3(w * T), atol=1e-5)
    # v(T) = int R(t) a_b dt with a_b rotating under R(t): world frame
    # result is just a_w * T (constant world accel)
    np.testing.assert_allclose(pre.dv, a_w * T, atol=2e-3)
    np.testing.assert_allclose(pre.dp, 0.5 * a_w * T * T, atol=2e-3)


def test_preintegrate_merge_equals_whole():
    rng = np.random.default_rng(3)
    ts = np.sort(rng.uniform(0, 1, 64))
    rows = np.concatenate(
        [ts[:, None], rng.normal(0, 0.5, (64, 6))], axis=1)
    whole = I.preintegrate(rows)
    # split at an interior sample; the split row terminates part A and
    # starts part B (shared boundary sample)
    a = I.preintegrate(rows[:40])
    b = I.preintegrate(rows[39:])
    m = a.merge(b)
    np.testing.assert_allclose(m.dR, whole.dR, atol=1e-10)
    np.testing.assert_allclose(m.dv, whole.dv, atol=1e-10)
    np.testing.assert_allclose(m.dp, whole.dp, atol=1e-10)
    assert abs(m.dt - whole.dt) < 1e-12


def _circle_trajectory(n=12, dt=0.5, radius=1.5):
    """Body-to-world poses on a circle with varying height (enough
    excitation for the linear alignment to be full-rank)."""
    times = np.arange(n) * dt
    c2w = np.zeros((n, 4, 4))
    for k, t in enumerate(times):
        ang = 0.35 * t
        R = I.exp_so3(np.array([0.05 * np.sin(t), 0.04 * t, ang]))
        p = np.array([radius * np.cos(ang), radius * np.sin(ang),
                      0.3 * np.sin(0.9 * t)])
        c2w[k, :3, :3] = R
        c2w[k, :3, 3] = p
        c2w[k, 3, 3] = 1.0
    return times, c2w


def test_align_visual_inertial_recovers_gravity_and_scale():
    times, c2w = _circle_trajectory()
    blocks = I.imu_from_poses(times, c2w, rate=200.0)
    true_scale = 3.7
    R_wb = [c2w[k, :3, :3] for k in range(len(times))]
    p_vis = [c2w[k, :3, 3] / true_scale for k in range(len(times))]
    pres = [I.preintegrate(b) for b in blocks]
    out = I.align_visual_inertial(R_wb, p_vis, pres)
    assert out is not None
    assert abs(out["scale"] - true_scale) / true_scale < 0.05, out
    g = out["g_w"]
    np.testing.assert_allclose(g / np.linalg.norm(g), [0, 0, -1.0],
                               atol=0.05)
    assert out["residual"] < 0.05


def test_align_rejects_degenerate_constant_velocity():
    """No acceleration excitation: scale/gravity are unobservable; the
    initializer must refuse rather than return garbage."""
    n, dt = 6, 0.5
    times = np.arange(n) * dt
    c2w = np.tile(np.eye(4), (n, 1, 1))
    c2w[:, 0, 3] = 0.4 * times            # constant velocity, no rotation
    R_wb = [c2w[k, :3, :3] for k in range(n)]
    p_vis = [c2w[k, :3, 3] for k in range(n)]
    pres = [I.preintegrate(b)
            for b in I.imu_from_poses(times, c2w, rate=200.0)]
    out = I.align_visual_inertial(R_wb, p_vis, pres)
    assert out is None or out["residual"] > 0.1


@pytest.fixture(scope="module")
def imu_seq():
    ds = SyntheticDataset(n_frames=24, width=256, height=144,
                          n_gaussians=7000, revolutions=0.15,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    times = np.array([f.timestamp for f in frames])
    c2w = np.stack([f.c2w for f in frames])
    blocks = I.imu_from_poses(times, c2w, rate=100.0)
    return ds, frames, blocks


@pytest.mark.slow
def test_mono_inertial_scale_init_metric_ate(imu_seq):
    """sensor='mono-inertial', no depth anywhere: the visual-inertial
    alignment must initialize gravity, publish SCALE_REFINEMENT (the
    IMU-init push the round-2 VERDICT flagged as consume-only), and leave
    a METRIC trajectory (bounded ATE without scale alignment)."""
    ds, frames, blocks = imu_seq
    fe = TrackingFrontend(ds.intrinsics, sensor="mono-inertial",
                          imu_init_kfs=6, kf_trans_th=0.05,
                          kf_rot_deg_th=5.0)
    assert fe.use_imu and fe.sensor == "mono"
    ops = []
    for k, fr in enumerate(frames):
        fe.track(dataclasses.replace(fr, c2w=None, depth=None),
                 imu=blocks[k - 1] if k > 0 else None)
        while fe.queue.has_operation():
            ops.append(fe.queue.pop_operation())
    assert fe.imu_ready, "visual-inertial init never succeeded"
    assert fe.n_imu_inits >= 1
    kinds = [op.kind for op in ops]
    assert OpKind.SCALE_REFINEMENT in kinds, kinds
    fids, traj = fe.trajectory()
    gt = np.stack([frames[int(i)].c2w for i in fids])
    # metric claim: the Umeyama-optimal residual scale is near 1 (the
    # IMU init fixed the gross mono scale ambiguity; closed-form init
    # over 1 s KF gaps is coarse, refined online in the reference too)
    ate_s = ate_rmse(traj[:, :3, 3], gt[:, :3, 3], with_scale=True)
    assert 0.8 < ate_s["scale"] < 1.25, ate_s
    ate = ate_rmse(traj[:, :3, 3], gt[:, :3, 3], with_scale=False)
    assert ate["rmse"] < 0.45, ate


@pytest.mark.slow
def test_rgbd_inertial_dead_reckons_through_blackout(imu_seq):
    """sensor='rgbd-inertial': during a camera blackout the pose must
    follow the IMU prediction (Tracking::PredictStateIMU) instead of
    freezing at the last visual pose."""
    ds, frames, blocks = imu_seq
    fe = TrackingFrontend(ds.intrinsics, sensor="rgbd-inertial",
                          imu_init_kfs=6, reloc_after=10**9,
                          kf_trans_th=0.05, kf_rot_deg_th=5.0)
    n_lead = 16
    for k in range(n_lead):
        fe.track(dataclasses.replace(frames[k], c2w=None),
                 imu=blocks[k - 1] if k > 0 else None)
    assert fe.imu_ready
    # blackout frames 16..19: vision dead, IMU continues
    for k in range(n_lead, 20):
        black = dataclasses.replace(
            frames[k], color=np.zeros_like(frames[k].color), c2w=None)
        fe.track(black, imu=blocks[k - 1])
    assert fe.lost_frames >= 3
    est = fe.poses[19]
    gt = frames[19].c2w
    frozen = fe.poses[n_lead - 1]
    err_imu = np.linalg.norm(est[:3, 3] - gt[:3, 3])
    err_frozen = np.linalg.norm(frozen[:3, 3] - gt[:3, 3])
    # dead-reckoning must beat the frozen-pose fallback and stay bounded
    assert err_imu < err_frozen, (err_imu, err_frozen)
    assert err_imu < 0.3, err_imu
