"""Monocular tracking mode + relocalization (C17 scope, round-3 VERDICT
items): essential-matrix two-view init, PnP tracking, DLT triangulation,
depth-borrow SCALE_REFINEMENT emission, and blackout recovery.

Reference behaviors covered: Tracking::MonocularInitialization +
TwoViewReconstruction (ORB-SLAM3/src/Tracking.cc), Optimizer::
PoseOptimization (motion-only), Tracking::Relocalization, and the
ScaleRefinement MappingOperation push (src/LocalMapping.cc:1300-1304).
"""
import dataclasses

import numpy as np
import pytest

from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.eval_harness.metrics import ate_rmse
from legslam_tpu.slam import tracking as T
from legslam_tpu.slam.interface import OpKind


def _rand_pose(rng, max_ang=0.5, max_t=0.5):
    ang = rng.uniform(0.05, max_ang)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    return R.astype(np.float32), \
        (max_t * rng.normal(size=3)).astype(np.float32)


def _project(world, R, t):
    cam = world @ R.T + t
    return cam[:, :2] / cam[:, 2:3], cam[:, 2]


def test_essential_recovers_relative_pose():
    rng = np.random.default_rng(0)
    world = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    world[:, 2] += 4.0
    R, t = _rand_pose(rng, max_ang=0.3, max_t=0.4)
    t = t / np.linalg.norm(t)
    x1, z1 = _project(world, np.eye(3, dtype=np.float32),
                      np.zeros(3, np.float32))
    x2, z2 = _project(world, R, t)
    E, inl = T.essential_ransac(x1, x2, rng)
    assert E is not None and inl.sum() > 150
    Rh, th, good = T.decompose_essential(E, x1[inl], x2[inl])
    assert Rh is not None
    np.testing.assert_allclose(Rh, R, atol=1e-3)
    # translation recovered up to scale
    cos = abs(float(th @ t)) / (np.linalg.norm(th) * np.linalg.norm(t))
    assert cos > 0.999


def test_pnp_gn_recovers_pose_with_outliers():
    rng = np.random.default_rng(1)
    world = rng.uniform(-2, 2, (120, 3)).astype(np.float32)
    world[:, 2] += 5.0
    R, t = _rand_pose(rng, max_ang=0.2, max_t=0.3)
    xn, _ = _project(world, R, t)
    xn[::10] += 0.1  # 10% gross outliers
    R0 = np.eye(3, dtype=np.float32)  # far init
    Rh, th, inl = T.pnp_gn(world, xn, R0, np.zeros(3, np.float32),
                           iters=30)
    assert Rh is not None
    # re-run from the first estimate (Huber trims the outliers)
    Rh, th, inl = T.pnp_gn(world[inl], xn[inl], Rh, th, iters=20)
    np.testing.assert_allclose(Rh, R, atol=2e-3)
    np.testing.assert_allclose(th, t, atol=2e-2)


def test_triangulate_multi_exact():
    rng = np.random.default_rng(2)
    X = np.array([0.3, -0.2, 4.0], np.float32)
    Rs, ts, xs = [], [], []
    for _ in range(4):
        R, t = _rand_pose(rng, max_ang=0.3, max_t=0.5)
        Rs.append(R)
        ts.append(t)
        cam = R @ X + t
        xs.append(cam[:2] / cam[2])
    Xh = T.triangulate_multi(np.stack(Rs), np.stack(ts), np.stack(xs))
    np.testing.assert_allclose(Xh, X, atol=1e-4)


@pytest.fixture(scope="module")
def mono_seq():
    ds = SyntheticDataset(n_frames=24, width=256, height=144,
                          n_gaussians=7000, revolutions=0.15,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    return ds, frames


@pytest.mark.slow
def test_mono_tracking_ate_up_to_scale(mono_seq):
    """Pure monocular (no depth at all): bounded ATE after
    Umeyama-with-scale alignment."""
    ds, frames = mono_seq
    fe = T.TrackingFrontend(ds.intrinsics, sensor="mono")
    for fr in frames:
        fe.track(dataclasses.replace(fr, c2w=None, depth=None))
    assert fe.initialized
    assert fe.num_keyframes >= 3
    fids, traj = fe.trajectory()
    gt = np.stack([frames[int(i)].c2w for i in fids])
    ate = ate_rmse(traj[:, :3, 3], gt[:, :3, 3])  # with_scale default
    assert ate["rmse"] < 0.08, ate


@pytest.mark.slow
def test_mono_scale_refinement_emitted_and_metric(mono_seq):
    """Mono tracking with a depth sensor available for scale borrowing:
    SCALE_REFINEMENT ops are published and the trajectory becomes METRIC
    (bounded ATE without scale alignment)."""
    ds, frames = mono_seq
    fe = T.TrackingFrontend(ds.intrinsics, sensor="mono",
                            scale_refine_kfs=2)
    ops = []
    for fr in frames:
        fe.track(dataclasses.replace(fr, c2w=None))  # depth stays
        while fe.queue.has_operation():
            ops.append(fe.queue.pop_operation())
    kinds = [op.kind for op in ops]
    assert OpKind.SCALE_REFINEMENT in kinds, kinds
    sr = [op for op in ops if op.kind == OpKind.SCALE_REFINEMENT]
    assert all(0.2 < op.scale < 100.0 for op in sr)
    assert abs(fe.mono_scale - 1.0) > 0.01  # scale actually moved
    fids, traj = fe.trajectory()
    gt = np.stack([frames[int(i)].c2w for i in fids])
    ate = ate_rmse(traj[:, :3, 3], gt[:, :3, 3], with_scale=False)
    assert ate["rmse"] < 0.12, ate


@pytest.mark.slow
def test_rgbd_relocalization_after_blackout(mono_seq):
    """Blacked-out frames lose tracking; the frontend relocalizes against
    the keyframe store when frames return (Tracking::Relocalization
    contract) instead of drifting at identity."""
    ds, frames = mono_seq
    fe = T.TrackingFrontend(ds.intrinsics, ransac_thresh=0.1,
                            reloc_after=2)
    black = dataclasses.replace(
        frames[0], color=np.zeros_like(frames[0].color), c2w=None)
    seq = frames[:12] + [dataclasses.replace(black, index=100 + i)
                         for i in range(4)] + frames[10:]
    for fr in seq:
        fe.track(dataclasses.replace(fr, c2w=None))
    assert fe.lost_frames > 0
    assert fe.n_relocalizations >= 1
    # the post-blackout tail must be tracked near GT again
    fids, traj = fe.trajectory()
    tail = [i for i, f in enumerate(fids) if f >= 15 and f < 100]
    gt = np.stack([frames[int(fids[i])].c2w for i in tail])
    est = traj[tail]
    ate = ate_rmse(est[:, :3, 3], gt[:, :3, 3])
    assert ate["rmse"] < 0.1, ate


@pytest.mark.slow
def test_mono_packets_feed_mapper_contract(mono_seq):
    """Mono keyframe packets satisfy the bridge contract the mapper's
    monocular densify branch expects: kp_points_local z = -1 for
    untriangulated tracks, valid camera-local z for triangulated ones."""
    ds, frames = mono_seq
    fe = T.TrackingFrontend(ds.intrinsics, sensor="mono")
    packets = []
    for fr in frames:
        p = fe.track(dataclasses.replace(fr, c2w=None, depth=None))
        if p is not None:
            packets.append(p)
    assert len(packets) >= 2
    last = packets[-1]
    assert last.depth is None
    assert last.kp_points_local is not None
    z = last.kp_points_local[:, 2]
    assert (z > 0).sum() >= 10          # triangulated landmarks exported
    assert (z == -1).sum() >= 1         # pending tracks marked


@pytest.mark.slow
def test_mono_loop_closure_fires_and_bounds_drift():
    """Monocular loop closing (PnP against the anchor's landmark worlds +
    Sim(3) essential-graph correction): a full revolution closes at least
    one loop, the up-to-scale ATE does not regress vs loops-off, and the
    loop packets carry sane per-KF Sim(3) scales for the mapper."""
    # 4.5 deg/frame: monocular triangulation needs more baseline per KF
    # than RGB-D (the rgbd loop test runs 9 deg/frame). 1.2 revolutions:
    # the consistency-group gate (loop_consistency, the defense the
    # aliasing tests pin) needs the SAME anchor region re-detected on
    # consecutive keyframes, so the sequence must keep traversing past
    # the 360-degree point — ending exactly at the loop leaves one
    # detection and no group (a real sequence keeps moving too).
    ds = SyntheticDataset(n_frames=96, width=320, height=192,
                          n_gaussians=9000, revolutions=1.2, radius=1.0,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    ates = {}
    loops_fired = 0
    for loops in (False, True):
        fe = T.TrackingFrontend(ds.intrinsics, sensor="mono",
                                loop_min_gap=8, enable_loop_closing=loops)
        for fr in frames:
            fe.track(dataclasses.replace(fr, c2w=None, depth=None))
        fids, traj = fe.trajectory()
        gt = np.stack([frames[int(i)].c2w for i in fids])
        ates[loops] = ate_rmse(traj[:, :3, 3], gt[:, :3, 3])["rmse"]
        if loops:
            loops_fired = fe.n_loop_closures
            lscales = [p.scale
                       for op in iter(fe.queue.pop_operation, None)
                       for p in op.keyframes if p.is_loop_kf]
    assert loops_fired >= 1
    # the Sim(3) graph ran: loop packets carry finite per-KF scales near
    # 1 on this low-drift scene (hard bounds only; value is scene noise)
    assert lscales and all(0.2 < s < 5.0 for s in lscales), lscales[:8]
    # the loop-corrected trajectory is at least as good (strictly better
    # when drift accumulated; equal-ish when mono drift was already tiny)
    assert ates[True] <= ates[False] * 1.05, ates


@pytest.mark.slow
def test_mono_map_reset_recovers_from_aggressive_motion():
    """At 9 deg/frame mono triangulation starves and tracking is lost
    mid-sequence; the Atlas-style new-map re-initialization must kick in
    and keyframe creation must resume (no permanent-lost tail)."""
    ds = SyntheticDataset(n_frames=40, width=320, height=192,
                          n_gaussians=9000, revolutions=1.0, radius=1.0,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    fe = T.TrackingFrontend(ds.intrinsics, sensor="mono",
                            enable_loop_closing=False)
    created_at = []
    for fr in frames:
        before = fe.n_keyframes_created
        fe.track(dataclasses.replace(fr, c2w=None, depth=None))
        if fe.n_keyframes_created > before:
            created_at.append(fr.index)
    assert fe.n_map_resets >= 1
    # keyframes keep being created in the second half of the sequence
    assert any(i >= len(frames) * 3 // 4 for i in created_at), created_at
    fids, traj = fe.trajectory()
    assert np.isfinite(traj).all() and len(fids) == len(frames)


def test_sim3_chain_correct_recovers_scale_drift():
    """Monocular essential-graph wiring (_sim3_chain_correct): a keyframe
    chain whose odometry accumulated multiplicative scale drift is pulled
    back by a scale-carrying Sim(3) loop edge — corrected centers land
    near ground truth and the per-KF scales recover the drift profile
    (Optimizer.cc OptimizeEssentialGraph bFixScale=false via
    LoopClosing.cc CorrectLoop)."""
    from legslam_tpu.slam import pose_graph as PG

    ds = SyntheticDataset(n_frames=1, width=64, height=48, n_gaussians=50)
    fe = T.TrackingFrontend(ds.intrinsics, sensor="mono",
                            enable_loop_closing=False)
    K, gamma = 12, 1.06
    c_true = np.stack([np.array([0.5 * j, 0.0, 0.0]) for j in range(K)])
    c_drift = [c_true[0]]
    for j in range(1, K):
        c_drift.append(c_drift[-1] + gamma ** j * (c_true[j] - c_true[j - 1]))
    c_drift = np.stack(c_drift)
    gray = np.zeros((48, 64), np.float32)
    P = np.zeros((K, 4, 4))
    for j in range(K):
        Twc = np.eye(4)
        Twc[:3, 3] = c_drift[j]
        P[j] = Twc
        Tcw = np.linalg.inv(Twc).astype(np.float32)
        fe.keyframes[j] = T._KF(fid=j, R=np.ascontiguousarray(Tcw[:3, :3]),
                                t=np.ascontiguousarray(Tcw[:3, 3]),
                                gray=gray, color=gray, depth=None)
        fe._kf_order.append(j)
    # loop edge: corrected current vertex = true center; the vertex scale
    # maps DRIFTED-scale camera coords to the true world, and gamma > 1
    # inflates the drifted region by gamma^j, so s_cur = gamma^-(K-1)
    s_cur = gamma ** -(K - 1)
    S_cur = PG.sim3_matrix(np.eye(3), c_true[-1], s_cur)
    M_loop = np.linalg.inv(P[0]) @ S_cur
    scales = fe._sim3_chain_correct(list(range(1, K)), P, None, M_loop)

    centers = np.stack([-(fe.keyframes[j].R.T @ fe.keyframes[j].t)
                        for j in range(K)])
    drift_err = np.linalg.norm(c_drift[-1] - c_true[-1])
    corr_err = np.linalg.norm(centers[-1] - c_true[-1])
    assert corr_err < 0.2 * drift_err, (corr_err, drift_err)
    # per-vertex scales recover the 1/gamma^j drift profile (monotone
    # decreasing, endpoint pinned by the loop edge)
    svals = [scales[j] for j in range(1, K)]
    assert abs(svals[-1] - s_cur) / s_cur < 0.15, (svals[-1], s_cur)
    assert svals[-1] < svals[len(svals) // 2] < svals[0] + 0.02


def test_mapper_loop_surgery_applies_packet_scale(tmp_path):
    """LOOP_CLOSE_BA packets carrying a per-KF Sim(3) scale transform the
    anchored gaussians about the keyframe camera (x' = s*x about the
    camera center; here identity pose with s=2 => x' = 2x, log-scaling
    += log 2) — the mapper-side consumer of the monocular essential
    graph's output."""
    import jax.numpy as jnp

    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.slam.interface import (KeyframePacket,
                                            MappingOperation, OpKind,
                                            OperationQueue)

    ds = SyntheticDataset(n_frames=1, width=64, height=48, n_gaussians=50)
    q = OperationQueue()
    mapper = GaussianMapper(q, ds.intrinsics, capacity=1 << 10,
                            result_dir=str(tmp_path),
                            include_lang_feat=False)
    color = np.zeros((48, 64, 3), np.float32)
    pkt = KeyframePacket(fid=0, timestamp=0.0,
                         R=np.eye(3, dtype=np.float32),
                         t=np.zeros(3, np.float32), color=color,
                         depth=None, lf_image=None)
    mapper.handle_operation(MappingOperation(kind=OpKind.LOCAL_BA,
                                             keyframes=[pkt]))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:, 2] += 3.0                      # in front of the camera
    cols = rng.uniform(size=(64, 3)).astype(np.float32)
    mapper.state = G.create_from_pcd(pts, cols, capacity=1 << 10)
    xyz0 = np.asarray(mapper.state.params.xyz[:64])
    sc0 = np.asarray(mapper.state.params.scaling[:64])

    loop_pkt = KeyframePacket(fid=0, timestamp=0.0,
                              R=np.eye(3, dtype=np.float32),
                              t=np.zeros(3, np.float32), color=color,
                              depth=None, lf_image=None,
                              is_loop_kf=True, scale=2.0)
    mapper.handle_operation(MappingOperation(kind=OpKind.LOOP_CLOSE_BA,
                                             keyframes=[loop_pkt]))
    xyz1 = np.asarray(mapper.state.params.xyz[:64])
    sc1 = np.asarray(mapper.state.params.scaling[:64])
    np.testing.assert_allclose(xyz1, 2.0 * xyz0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sc1, sc0 + np.log(2.0), rtol=1e-5,
                               atol=1e-5)
