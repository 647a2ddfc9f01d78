"""Visual tracking frontend (C17): poses WITHOUT ground truth.

Covers the reference frontend's output contract (SURVEY.md §1 L5):
keyframes + map points + LOCAL_BA ops from un-posed RGB-D video, a
non-vacuous ATE (vs the GT the tracker never sees), keyframe culling
feeding the live set, and loop closure reducing drift.
"""
import dataclasses

import numpy as np
import pytest

from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.eval_harness.metrics import ate_rmse
from legslam_tpu.slam import tracking as T


def _rand_pose(rng):
    ang = rng.uniform(0.1, 1.0)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    return R.astype(np.float32), rng.normal(size=3).astype(np.float32)


def test_rigid_align_recovers_exact_pose():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 3)).astype(np.float32)
    R, t = _rand_pose(rng)
    B = A @ R.T + t
    Rh, th = T.rigid_align(A, B)
    np.testing.assert_allclose(Rh, R, atol=1e-5)
    np.testing.assert_allclose(th, t, atol=1e-5)


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(80, 3)).astype(np.float32)
    R, t = _rand_pose(rng)
    B = A @ R.T + t
    B[::4] += rng.normal(scale=2.0, size=(20, 3))  # 25% gross outliers
    Rh, th, inl = T.ransac_rigid(A, B, rng, thresh=0.05)
    assert Rh is not None
    assert inl.sum() >= 55
    np.testing.assert_allclose(Rh, R, atol=1e-3)
    np.testing.assert_allclose(th, t, atol=1e-3)


def test_fractional_rigid_endpoints():
    rng = np.random.default_rng(2)
    R, t = _rand_pose(rng)
    W = np.eye(4, dtype=np.float32)
    W[:3, :3], W[:3, 3] = R, t
    np.testing.assert_allclose(T._fractional_rigid(W, 1.0), W, atol=1e-5)
    np.testing.assert_allclose(T._fractional_rigid(W, 0.0), np.eye(4),
                               atol=1e-6)


@pytest.fixture(scope="module")
def gentle_seq():
    ds = SyntheticDataset(n_frames=20, width=256, height=144,
                          n_gaussians=7000, revolutions=0.15,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    return ds, frames


@pytest.fixture(scope="module")
def tracked(gentle_seq):
    ds, frames = gentle_seq
    fe = T.TrackingFrontend(ds.intrinsics, ransac_thresh=0.1)
    for fr in frames:
        fe.track(dataclasses.replace(fr, c2w=None))  # GT pose hidden
    return ds, frames, fe


@pytest.mark.slow
def test_tracking_ate_without_gt(tracked):
    ds, frames, fe = tracked
    assert fe.num_keyframes >= 3
    assert fe.lost_frames == 0
    fids, traj = fe.trajectory()
    gt = np.stack([frames[int(i)].c2w for i in fids])
    ate = ate_rmse(traj[:, :3, 3], gt[:, :3, 3])
    assert ate["rmse"] < 0.05, ate
    ate_ns = ate_rmse(traj[:, :3, 3], gt[:, :3, 3], with_scale=False)
    assert ate_ns["rmse"] < 0.15, ate_ns


@pytest.mark.slow
def test_tracking_beats_integrated_odometry(tracked):
    """Landmark anchoring + local BA must drift less than naive
    frame-to-frame odometry integration (the VERDICT acceptance bar)."""
    ds, frames, fe = tracked
    rng = np.random.default_rng(0)
    Rw = np.eye(3, dtype=np.float32)
    tw = np.zeros(3, np.float32)
    centers = [-(Rw.T @ tw)]
    prev = frames[0]
    prev_gray = T.to_gray(prev.color)
    helper = T.TrackingFrontend(ds.intrinsics)
    pts = T.detect_corners(prev_gray, 600)
    for cur in frames[1:]:
        cg = T.to_gray(cur.color)
        npx, ok = T.klt_track(prev_gray, cg, pts)
        A, okA = helper._lift(pts[ok], prev.depth)
        B, okB = helper._lift(npx[ok], cur.depth)
        use = okA & okB
        R, t, _ = T.ransac_rigid(A[use], B[use], rng, thresh=0.1)
        if R is not None:
            Rw, tw = R @ Rw, R @ tw + t
        centers.append(-(Rw.T @ tw))
        prev, prev_gray = cur, cg
        pts = T.detect_corners(cg, 600)
    gt = np.stack([f.c2w[:3, 3] for f in frames])
    ate_odo = ate_rmse(np.stack(centers), gt, with_scale=False)["rmse"]
    fids, traj = fe.trajectory()
    gt_t = np.stack([frames[int(i)].c2w for i in fids])[:, :3, 3]
    ate_trk = ate_rmse(traj[:, :3, 3], gt_t, with_scale=False)["rmse"]
    assert ate_trk < ate_odo, (ate_trk, ate_odo)


@pytest.mark.slow
def test_emits_mapping_operations_and_keypoints(tracked):
    ds, frames, fe = tracked
    ops = []
    while True:
        op = fe.queue.pop_operation()
        if op is None:
            break
        ops.append(op)
    assert len(ops) == fe.n_keyframes_created + fe.n_loop_closures
    first = ops[0]
    assert first.points_xyz is not None and len(first.points_xyz) >= 50
    pk = first.keyframes[0]
    assert pk.kp_pixels is not None and pk.kp_points_local is not None
    # exported map points live near the synthetic box scene
    assert np.abs(first.points_xyz).max() < 8.0


@pytest.mark.slow
def test_keyframe_culling_feeds_live_set(gentle_seq):
    ds, frames = gentle_seq
    # force a KF every frame with long-lived tracks -> redundancy culls
    fe = T.TrackingFrontend(ds.intrinsics, ransac_thresh=0.1,
                            kf_trans_th=0.001, kf_rot_deg_th=0.1,
                            enable_loop_closing=False)
    for fr in frames:
        fe.track(dataclasses.replace(fr, c2w=None))
    created = len(frames)  # every frame became a KF
    live = fe.queue.live_keyframe_ids()
    assert fe.num_keyframes < created
    assert live == set(fe._kf_order)
    # trajectory reconstruction must survive culled reference KFs
    fids, traj = fe.trajectory()
    assert np.isfinite(traj).all() and len(fids) == len(frames)


@pytest.mark.slow
def test_loop_closure_reduces_drift():
    # 320x192 / 9 deg-per-frame: fast enough to accumulate visible drift
    # over the revolution, slow enough for KLT to survive every frame
    ds = SyntheticDataset(n_frames=40, width=320, height=192,
                          n_gaussians=9000, revolutions=1.0, radius=1.0,
                          clutter_ratio=0.0)
    frames = [ds.read(i) for i in range(len(ds))]
    ates = {}
    for loops in (False, True):
        fe = T.TrackingFrontend(ds.intrinsics, ransac_thresh=0.1,
                                loop_min_gap=8, enable_loop_closing=loops)
        for fr in frames:
            fe.track(dataclasses.replace(fr, c2w=None))
        fids, traj = fe.trajectory()
        gt = np.stack([frames[int(i)].c2w for i in fids])
        ates[loops] = ate_rmse(traj[:, :3, 3], gt[:, :3, 3],
                               with_scale=False)["rmse"]
        if loops:
            assert fe.n_loop_closures >= 1
            # a LOOP_CLOSE_BA op reached the queue
            kinds = []
            while True:
                op = fe.queue.pop_operation()
                if op is None:
                    break
                kinds.append(op.kind)
            from legslam_tpu.slam.interface import OpKind
            assert OpKind.LOOP_CLOSE_BA in kinds
    assert ates[True] < ates[False], ates


@pytest.mark.slow
def test_mapper_e2e_with_tracked_poses(gentle_seq, tmp_path):
    """VERDICT acceptance: hide frame.c2w from everything; the mapper must
    still converge (PSNR) and the trajectory must land (ATE)."""
    from legslam_tpu.config import (MapperParams, OptimizationParams,
                                    RasterizeConfig)
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.ops import losses

    ds, frames = gentle_seq
    fe = T.TrackingFrontend(ds.intrinsics, ransac_thresh=0.1,
                            enable_loop_closing=False)
    mapper = GaussianMapper(
        fe.queue, ds.intrinsics,
        opt=OptimizationParams(
            densify_from_iter=10, densification_interval=40,
            opacity_reset_interval=0, iterations=200,
            position_lr_init=0.0016, position_lr_final=1.6e-5),
        mp=MapperParams(min_num_initial_map_kfs=3, depth_cache=3),
        cfg=RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3,
                            max_span_y=8, chunk=64, tile_batch=4),
        capacity=1 << 14, result_dir=str(tmp_path), max_per_tile=512,
        include_lang_feat=False)
    for fr in frames:
        fe.track(dataclasses.replace(fr, c2w=None))
    fe.finish()
    mapper.run(max_iterations=100, tail_iterations=100)

    assert mapper.iteration >= 80
    kf = next(iter(mapper.keyframes.values()))
    out = mapper.render_from_pose(kf.R, kf.t, kf.views[-1].width,
                                  kf.views[-1].height)
    gt = kf.gt_color[-1]
    psnr = float(losses.psnr(out.color, gt))
    base = float(losses.psnr(gt * 0 + 0.5, gt))
    assert psnr > base + 3.0, (psnr, base)

    fids, traj = fe.trajectory()
    gt_traj = np.stack([frames[int(i)].c2w for i in fids])
    ate = ate_rmse(traj[:, :3, 3], gt_traj[:, :3, 3], with_scale=False)
    assert ate["rmse"] < 0.15, ate
