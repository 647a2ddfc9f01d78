"""SE(3) pose-graph optimization (slam/pose_graph.py): exp/log round
trips, and the loop-closure use case — accumulated odometry drift pulled
back by a strong loop edge (the essential-graph equivalent,
Optimizer.cc OptimizeEssentialGraph)."""
import numpy as np
import pytest

from legslam_tpu.slam import pose_graph as PG


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        xi = rng.normal(0, 1.0, 6)
        T = PG.se3_exp(xi)
        np.testing.assert_allclose(PG.se3_log(T), xi, atol=1e-8)
    # small-angle branch
    xi = np.array([1e-12, 0, 0, 0.3, -0.2, 0.1])
    np.testing.assert_allclose(PG.se3_log(PG.se3_exp(xi)), xi, atol=1e-9)


def _circle_poses(K, radius=2.0):
    out = []
    for k in range(K):
        a = 2.0 * np.pi * k / K
        T = np.eye(4)
        T[:3, :3] = _rot_z(a)
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        out.append(T)
    return np.stack(out)


def test_loop_edge_pulls_back_drift():
    """Odometry edges from drifted poses + one strong loop edge: the
    optimized trajectory lands much closer to GT than the drifted one."""
    K = 24
    gt = _circle_poses(K)
    # accumulate a per-step drift twist
    drift = PG.se3_exp(np.array([0.0, 0.0, 0.02, 0.015, -0.01, 0.0]))
    poses = [gt[0]]
    for k in range(1, K):
        M = np.linalg.inv(gt[k - 1]) @ gt[k]
        poses.append(poses[-1] @ M @ drift)
    poses = np.stack(poses)
    err_before = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)

    cons = PG.chain_constraints(poses)  # believes the drifted odometry
    # exact loop edge from the anchor to the final pose
    M_loop = np.linalg.inv(gt[0]) @ gt[-1]
    cons.append((0, K - 1, M_loop, 100.0))
    opt = PG.optimize_pose_graph(poses, cons, fixed={0})

    err_after = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1)
    # the endpoint satisfies the loop edge almost exactly
    assert err_after[-1] < 0.05, err_after[-1]
    # and the whole chain improves substantially
    assert err_after.mean() < 0.5 * err_before.mean(), (
        err_after.mean(), err_before.mean())
    # anchor untouched
    np.testing.assert_allclose(opt[0], gt[0], atol=1e-12)


def test_consistent_graph_is_fixed_point():
    """With self-consistent constraints the solution doesn't move."""
    gt = _circle_poses(10)
    cons = PG.chain_constraints(gt)
    opt = PG.optimize_pose_graph(gt, cons, fixed={0})
    np.testing.assert_allclose(opt, gt.astype(np.float32), atol=1e-6)


def test_log_near_pi_and_nan_guard():
    rng = np.random.default_rng(3)
    # exp/log roundtrip right at / near theta = pi
    for th in (np.pi - 1e-6, np.pi - 1e-3, np.pi * 0.999):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        xi = np.concatenate([th * axis, rng.normal(0, 0.5, 3)])
        T = PG.se3_exp(xi)
        xi2 = PG.se3_log(T)
        np.testing.assert_allclose(PG.se3_exp(xi2), T, atol=1e-7)
    # a near-pi loop edge must not corrupt poses with NaNs
    gt = _circle_poses(8)
    cons = PG.chain_constraints(gt)
    flip = np.eye(4)
    flip[:3, :3] = PG.se3_exp(
        np.array([np.pi - 1e-9, 0, 0, 0, 0, 0]))[:3, :3]
    cons.append((0, 7, flip, 50.0))
    opt = PG.optimize_pose_graph(gt, cons, fixed={0})
    assert np.isfinite(opt).all()


def test_banded_solve_matches_dense_and_scales():
    """Chain graphs use the banded normal-equation solve; results match
    the small-K dense path and a 300-pose chain optimizes quickly."""
    import time
    K = 300
    gt = _circle_poses(K)
    drift = PG.se3_exp(np.array([0, 0, 0.002, 0.0015, -0.001, 0]))
    poses = [gt[0]]
    for k in range(1, K):
        M = np.linalg.inv(gt[k - 1]) @ gt[k]
        poses.append(poses[-1] @ M @ drift)
    poses = np.stack(poses)
    cons = PG.chain_constraints(poses)
    cons.append((0, K - 1, np.linalg.inv(gt[0]) @ gt[-1], 100.0))
    t0 = time.perf_counter()
    opt = PG.optimize_pose_graph(poses, cons, fixed={0})
    dt = time.perf_counter() - t0
    err_b = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    err_a = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    assert err_a < 0.5 * err_b, (err_a, err_b)
    assert dt < 20.0, dt  # banded O(K); generous for box contention


# -- Sim(3) (monocular essential graph) ---------------------------------

def test_sim3_exp_log_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(50):
        xi = rng.normal(0, 0.8, 7)
        T = PG.sim3_exp(xi)
        np.testing.assert_allclose(PG.sim3_log(T), xi, atol=1e-8)
    # degenerate corners: zero rotation / zero scale / both
    for xi in (np.array([0, 0, 0, 0.3, -0.2, 0.1, 0.4]),
               np.array([0.5, -0.2, 0.1, 0.3, -0.2, 0.1, 0.0]),
               np.array([1e-12, 0, 0, 0.3, -0.2, 0.1, 1e-12])):
        np.testing.assert_allclose(PG.sim3_log(PG.sim3_exp(xi)), xi,
                                   atol=1e-9)
    # parts/matrix roundtrip
    R = PG.se3_exp(np.array([0.2, -0.4, 0.1, 0, 0, 0]))[:3, :3]
    T = PG.sim3_matrix(R, np.array([1.0, 2.0, -3.0]), 1.7)
    R2, t2, s2 = PG.sim3_parts(T)
    np.testing.assert_allclose(R2, R, atol=1e-12)
    np.testing.assert_allclose(s2, 1.7, atol=1e-12)


def test_sim3_adjoint_matches_numeric():
    """log(T exp(xi) T^-1) == Ad_T xi (checked in the small-xi linear
    regime, where the identity is exact for any xi magnitude anyway)."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        T = PG.sim3_exp(rng.normal(0, 0.6, 7))
        Ad = PG._sim3_adjoint(T)
        xi = rng.normal(0, 1.0, 7)
        lhs = PG.sim3_log(T @ PG.sim3_exp(xi) @ np.linalg.inv(T))
        np.testing.assert_allclose(lhs, Ad @ xi, atol=1e-7)


def test_sim3_loop_recovers_scale_drift():
    """Monocular failure mode: each odometry step is believed at a
    drifting scale (the circle spirals outward). The Sim(3) loop edge
    carries the RELATIVE SCALE between the current gauge and the anchor
    gauge — exactly what ComputeSim3 measures in the reference
    (LoopClosing.cc) — and the essential graph distributes it: per-vertex
    scales ramp along the 1/s_acc profile, interior position error
    collapses ~10x. SE(3) optimization cannot do this (no scale DoF):
    the same graph with a scale-1 loop edge leaves the interior error
    unimproved (measured 0.79 vs 0.775)."""
    K = 20
    gt = _circle_poses(K)
    poses = [gt[0]]
    s_step = 1.03  # 3% scale drift per step => ~1.75x at the chain end
    s_acc = 1.0
    for k in range(1, K):
        M = np.linalg.inv(gt[k - 1]) @ gt[k]
        s_acc *= s_step
        Md = M.copy()
        Md[:3, 3] *= s_acc          # translation measured at wrong scale
        poses.append(poses[-1] @ Md)
    S = np.stack(poses)              # scale-1 Sim(3) elements (drifted)
    err_before = np.linalg.norm(S[:, :3, 3] - gt[:, :3, 3], axis=1)

    cons = PG.chain_constraints(S)   # believes the drifted odometry
    Mrel = np.linalg.inv(gt[0]) @ gt[-1]
    loop = PG.sim3_matrix(Mrel[:3, :3], Mrel[:3, 3], 1.0 / s_acc)
    cons.append((0, K - 1, loop, 100.0))
    opt = PG.optimize_sim3_graph(S, cons, fixed={0})

    Rs, ts, ss = zip(*[PG.sim3_parts(T) for T in opt])
    ts = np.stack(ts)
    err_after = np.linalg.norm(ts - gt[:, :3, 3], axis=1)
    assert err_after[-1] < 0.01, err_after[-1]
    assert err_after.mean() < 0.15 * err_before.mean(), (
        err_after.mean(), err_before.mean())
    # per-vertex scales absorb the drift along the 1/s_acc profile
    np.testing.assert_allclose(
        ss[10], 1.0 / 1.03 ** 10, rtol=0.05)
    assert abs(ss[-1] - 1.0 / s_acc) < 0.05, (ss[-1], 1.0 / s_acc)
    np.testing.assert_allclose(opt[0], gt[0], atol=1e-12)


def test_sim3_banded_long_chain():
    import time
    K = 250
    gt = _circle_poses(K)
    poses = [gt[0]]
    for k in range(1, K):
        M = np.linalg.inv(gt[k - 1]) @ gt[k]
        Md = M.copy()
        Md[:3, 3] *= 1.002 ** k
        poses.append(poses[-1] @ Md)
    S = np.stack(poses)
    cons = PG.chain_constraints(S)
    Mrel = np.linalg.inv(gt[0]) @ gt[-1]
    cons.append((0, K - 1,
                 PG.sim3_matrix(Mrel[:3, :3], Mrel[:3, 3],
                                1.0 / 1.002 ** (K - 1)), 100.0))
    t0 = time.perf_counter()
    opt = PG.optimize_sim3_graph(S, cons, fixed={0})
    dt = time.perf_counter() - t0
    err_b = np.linalg.norm(S[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    ts = np.stack([PG.sim3_parts(T)[1] for T in opt])
    err_a = np.linalg.norm(ts - gt[:, :3, 3], axis=1).mean()
    assert err_a < 0.5 * err_b, (err_a, err_b)
    assert dt < 30.0, dt  # banded O(K) path; generous for box contention
