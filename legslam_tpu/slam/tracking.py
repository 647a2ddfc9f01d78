"""Visual RGB-D tracking frontend: poses WITHOUT ground truth.

TPU-native counterpart of the reference's modified ORB-SLAM3 fork (C17 in
SURVEY.md §2; `ORB-SLAM3/src/Tracking.cc:1626-1692` tracking,
`src/LocalMapping.cc:149-159` local BA + op push,
`src/KeyFrame.cc` keypoint export, `Atlas.h:52-170` MappingOperation).
This is a re-design, not a port: instead of ORB descriptors + DBoW2 + g2o,
it uses

  * Shi-Tomasi corners + pyramidal KLT feature tracks (frame-to-frame),
  * RGB-D landmark anchoring: every tracked feature is a *landmark* with a
    world position; per-frame pose solves the 3D-3D alignment of landmark
    world points to their current camera-frame lifts (depth from the
    sensor) with RANSAC + Kabsch — the RGB-D analogue of motion-only BA,
  * keyframe decisions by track attrition / parallax / pose delta
    (Tracking::NeedNewKeyFrame semantics, simplified),
  * a sliding-window local BA: block-coordinate descent alternating
    closed-form landmark updates (robust mean of per-KF backprojections)
    and closed-form pose updates (Kabsch against the refreshed landmarks)
    — the refined poses are re-published through LOCAL_BA MappingOperations
    exactly like the reference's Optimizer::LocalBundleAdjustment out-param
    (`ORB-SLAM3/src/Optimizer.cc:1479-1502`),
  * redundancy-based keyframe culling feeding the queue's live set
    (KeyFrameCulling: a KF dies when >=90% of its landmarks are seen by >=3
    other KFs), which is what makes `GaussianMapper.cull_keyframes` real,
  * pose-proximity + appearance loop detection with a Kabsch correction,
    published as a LOOP_CLOSE_BA op (LoopClosing.cc:1027-1034 contract).

The mapper consumes the exact same OperationQueue contract as the
GT-trajectory frontend, so the two are drop-in interchangeable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from legslam_tpu.data.datasets import RGBDFrame
from legslam_tpu.slam.interface import (
    KeyframePacket,
    MappingOperation,
    OperationQueue,
    OpKind,
)

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _use_native() -> bool:
    """Prefer the C++ kernels (native/tracking_core.cpp via slam/native.py)
    when opted in or when OpenCV is absent — the reference's frontend hot
    path is wholly native; ours is too under LEGSLAM_NATIVE_TRACKING=1."""
    import os
    want = os.environ.get("LEGSLAM_NATIVE_TRACKING") == "1" or not _HAS_CV2
    if not want:
        return False
    from legslam_tpu.slam import native
    return native.available()


# ---------------------------------------------------------------------------
# Feature detection / tracking primitives
# ---------------------------------------------------------------------------

def to_gray(color: np.ndarray) -> np.ndarray:
    g = color.mean(-1) if color.ndim == 3 else color
    return (np.clip(g, 0.0, 1.0) * 255).astype(np.uint8)


def detect_corners(gray: np.ndarray, max_corners: int,
                   min_distance: int = 7,
                   avoid: Optional[np.ndarray] = None) -> np.ndarray:
    """[N,2] (x,y) Shi-Tomasi corners, avoiding existing track positions."""
    if _use_native():
        from legslam_tpu.slam import native
        pts = native.detect_corners(gray.astype(np.float32) / 255.0,
                                    max_corners, min_distance)
        if avoid is not None and len(avoid) and len(pts):
            d2 = ((pts[:, None] - avoid[None]) ** 2).sum(-1)
            pts = pts[d2.min(1) >= min_distance ** 2]
        return pts
    if _HAS_CV2:
        mask = None
        if avoid is not None and len(avoid):
            mask = np.full(gray.shape, 255, np.uint8)
            for x, y in avoid:
                cv2.circle(mask, (int(x), int(y)), min_distance, 0, -1)
        pts = cv2.goodFeaturesToTrack(gray, max_corners, 0.01, min_distance,
                                      mask=mask)
        if pts is None:
            return np.zeros((0, 2), np.float32)
        return pts.reshape(-1, 2).astype(np.float32)
    # numpy fallback: min-eigenvalue response on a coarse grid
    h, w = gray.shape  # pragma: no cover
    ys, xs = np.mgrid[8:h - 8:12, 8:w - 8:12]
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)


def klt_track(prev_gray: np.ndarray, cur_gray: np.ndarray,
              pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Track pts [N,2] from prev to cur. Returns (new_pts, ok_mask)."""
    if len(pts) == 0:
        return pts, np.zeros((0,), bool)
    if _use_native():
        from legslam_tpu.slam import native
        nxt, ok = native.klt_track(prev_gray.astype(np.float32) / 255.0,
                                   cur_gray.astype(np.float32) / 255.0,
                                   pts)
        h, w = cur_gray.shape
        ok &= (nxt[:, 0] >= 1) & (nxt[:, 0] < w - 1) & \
              (nxt[:, 1] >= 1) & (nxt[:, 1] < h - 1)
        return nxt, ok
    if _HAS_CV2:
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(
            prev_gray, cur_gray, pts.reshape(-1, 1, 2), None,
            winSize=(21, 21), maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30,
                      0.01))
        nxt = nxt.reshape(-1, 2)
        ok = st.reshape(-1).astype(bool)
        h, w = cur_gray.shape
        ok &= (nxt[:, 0] >= 1) & (nxt[:, 0] < w - 1) & \
              (nxt[:, 1] >= 1) & (nxt[:, 1] < h - 1)
        return nxt.astype(np.float32), ok
    return _zncc_track(prev_gray, cur_gray, pts)  # pragma: no cover


def _zncc_track(prev_gray, cur_gray, pts, patch=7,
                radius=10):  # pragma: no cover — cv2-less fallback
    half = patch // 2
    h, w = cur_gray.shape
    pg = prev_gray.astype(np.float32)
    cg = cur_gray.astype(np.float32)
    out = pts.copy()
    ok = np.zeros(len(pts), bool)
    for i, (x, y) in enumerate(pts):
        xi, yi = int(round(x)), int(round(y))
        if not (half + radius < xi < w - half - radius and
                half + radius < yi < h - half - radius):
            continue
        tpl = pg[yi - half:yi + half + 1, xi - half:xi + half + 1]
        tpl = tpl - tpl.mean()
        best, bx, by = -1e9, xi, yi
        for dy in range(-radius, radius + 1, 2):
            for dx in range(-radius, radius + 1, 2):
                win = cg[yi + dy - half:yi + dy + half + 1,
                         xi + dx - half:xi + dx + half + 1]
                win = win - win.mean()
                score = float((tpl * win).sum())
                if score > best:
                    best, bx, by = score, xi + dx, yi + dy
        out[i] = (bx, by)
        ok[i] = True
    return out.astype(np.float32), ok


# ---------------------------------------------------------------------------
# Pose solving: 3D-3D Kabsch + RANSAC
# ---------------------------------------------------------------------------

def rigid_align(A: np.ndarray, B: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(R, t) minimizing ||R @ A + t - B||^2 (Kabsch; A, B [N,3])."""
    ca, cb = A.mean(0), B.mean(0)
    H = (A - ca).T @ (B - cb)
    U, _, Vt = np.linalg.svd(H.astype(np.float64))
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = (Vt.T @ np.diag([1.0, 1.0, d]) @ U.T).astype(np.float32)
    t = (cb - R @ ca).astype(np.float32)
    return R, t


def ransac_rigid(A: np.ndarray, B: np.ndarray, rng: np.random.Generator,
                 iters: int = 64, thresh: float = 0.05,
                 min_inliers: int = 8
                 ) -> tuple[Optional[np.ndarray], Optional[np.ndarray],
                            np.ndarray]:
    """Robust (R, t) with A -> B 3-point RANSAC + two inlier refits.
    Returns (R, t, inlier_mask); R is None when degenerate."""
    n = len(A)
    if n < 3:
        return None, None, np.zeros(n, bool)
    best_inl = np.zeros(n, bool)
    for _ in range(iters):
        idx = rng.choice(n, 3, replace=False)
        if np.linalg.matrix_rank(A[idx] - A[idx].mean(0)) < 2:
            continue
        R, t = rigid_align(A[idx], B[idx])
        err = np.linalg.norm(A @ R.T + t - B, axis=-1)
        inl = err < thresh
        if inl.sum() > best_inl.sum():
            best_inl = inl
    if best_inl.sum() < min_inliers:
        return None, None, best_inl
    R, t = rigid_align(A[best_inl], B[best_inl])
    for _ in range(2):  # refine on refreshed inliers
        err = np.linalg.norm(A @ R.T + t - B, axis=-1)
        inl = err < thresh
        if inl.sum() < 3:
            break
        best_inl = inl
        R, t = rigid_align(A[inl], B[inl])
    return R, t, best_inl


# ---------------------------------------------------------------------------
# The frontend
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Landmark:
    world: np.ndarray                 # [3] current world estimate
    color: np.ndarray                 # [3]
    obs: dict                         # kf_fid -> cam-frame point [3]
    created_kf: int


@dataclasses.dataclass
class _KF:
    fid: int
    R: np.ndarray                     # world->camera
    t: np.ndarray
    gray: np.ndarray
    color: np.ndarray
    depth: Optional[np.ndarray]


class TrackingFrontend:
    """RGB-D visual tracking + mapping-op publication (no GT poses)."""

    def __init__(self, intrinsics: dict, max_corners: int = 600,
                 min_depth: float = 1e-4, max_depth: float = 40.0,
                 min_track_ratio: float = 0.55,
                 kf_trans_th: float = 0.15, kf_rot_deg_th: float = 10.0,
                 ransac_thresh: float = 0.05, ba_window: int = 6,
                 ba_sweeps: int = 3, min_inliers: int = 12,
                 cull_redundancy: float = 0.95,
                 loop_min_gap: int = 10, loop_radius: float = 0.3,
                 loop_appearance_th: float = 0.4,
                 enable_loop_closing: bool = True,
                 max_keyframes_live: int = 0, seed: int = 0):
        self.queue = OperationQueue()
        self.last_vis = None  # viewer SLAM-frame snapshot (_capture_vis)
        self.intr = intrinsics
        self.max_corners = max_corners
        self.min_depth, self.max_depth = min_depth, max_depth
        self.min_track_ratio = min_track_ratio
        self.kf_trans_th = kf_trans_th
        self.kf_rot_deg_th = kf_rot_deg_th
        self.ransac_thresh = ransac_thresh
        self.ba_window = ba_window
        self.ba_sweeps = ba_sweeps
        self.min_inliers = min_inliers
        self.cull_redundancy = cull_redundancy
        self.loop_min_gap = loop_min_gap
        self.loop_radius = loop_radius
        self.loop_appearance_th = loop_appearance_th
        self.enable_loop_closing = enable_loop_closing
        self.max_keyframes_live = max_keyframes_live
        self._rng = np.random.default_rng(seed)

        self.landmarks: dict[int, _Landmark] = {}
        self._next_lm = 0
        self.keyframes: dict[int, _KF] = {}
        self._kf_order: list[int] = []
        # active tracks: parallel arrays
        self._track_lm: np.ndarray = np.zeros((0,), np.int64)
        self._track_px: np.ndarray = np.zeros((0, 2), np.float32)
        self._prev_gray: Optional[np.ndarray] = None
        self._last_kf_px_count = 0
        self.poses: dict[int, np.ndarray] = {}  # fid -> c2w (estimated)
        # fid -> (ref KF fid, T_frame_w2c @ inv(T_refkf_w2c)) at track time
        self._frame_ref: dict[int, tuple[int, np.ndarray]] = {}
        self._kf_final: dict[int, np.ndarray] = {}  # culled KFs' last pose
        self._cur_R = np.eye(3, dtype=np.float32)
        self._cur_t = np.zeros(3, np.float32)
        self.lost_frames = 0
        self.n_loop_closures = 0
        self.n_keyframes_created = 0

    # -- geometry helpers ------------------------------------------------
    def _lift(self, px: np.ndarray, depth: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """Pixels [N,2] -> camera-frame 3D via the depth map; mask of valid."""
        h, w = depth.shape
        xi = np.clip(px[:, 0].round().astype(int), 0, w - 1)
        yi = np.clip(px[:, 1].round().astype(int), 0, h - 1)
        d = depth[yi, xi]
        ok = (d > self.min_depth) & (d < self.max_depth) & np.isfinite(d)
        fx, fy = self.intr["fx"], self.intr["fy"]
        cx, cy = self.intr["cx"], self.intr["cy"]
        cam = np.stack([(px[:, 0] - cx) / fx * d,
                        (px[:, 1] - cy) / fy * d, d], -1).astype(np.float32)
        return cam, ok

    @staticmethod
    def _to_world(cam: np.ndarray, R: np.ndarray, t: np.ndarray
                  ) -> np.ndarray:
        return (cam - t) @ R

    def _store_pose(self, fid: int) -> None:
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = self._cur_R.T
        c2w[:3, 3] = -(self._cur_R.T @ self._cur_t)
        self.poses[fid] = c2w
        # store KF-relative so later BA / loop corrections of the reference
        # KF retro-correct the whole frame trajectory (the reference's
        # SaveTrajectoryTUM likewise emits frame poses relative to their
        # reference KF's FINAL pose, ORB-SLAM3/src/System.cc)
        if self._kf_order:
            ref = self.keyframes[self._kf_order[-1]]
            T_kf = np.eye(4, dtype=np.float32)
            T_kf[:3, :3], T_kf[:3, 3] = ref.R, ref.t
            T_f = np.eye(4, dtype=np.float32)
            T_f[:3, :3], T_f[:3, 3] = self._cur_R, self._cur_t
            self._frame_ref[fid] = (ref.fid, T_f @ np.linalg.inv(T_kf))

    # -- main per-frame entry ---------------------------------------------
    def track(self, frame: RGBDFrame,
              lf_image: Optional[np.ndarray] = None
              ) -> Optional[KeyframePacket]:
        gray = to_gray(frame.color)
        if frame.depth is None:
            raise ValueError("TrackingFrontend is RGB-D: depth required")

        if not self.keyframes:
            # bootstrap: world frame = first camera frame
            self._cur_R = np.eye(3, dtype=np.float32)
            self._cur_t = np.zeros(3, np.float32)
            self._store_pose(frame.index)
            packet = self._make_keyframe(frame, gray, lf_image)
            self._capture_vis(gray)
            self._prev_gray = gray
            return packet

        # 1. track features frame-to-frame
        new_px, ok = klt_track(self._prev_gray, gray, self._track_px)
        self._track_lm = self._track_lm[ok]
        self._track_px = new_px[ok]

        # 2. landmark-anchored pose: world -> current camera 3D-3D
        cam, dep_ok = self._lift(self._track_px, frame.depth)
        world = np.stack([self.landmarks[i].world for i in self._track_lm]) \
            if len(self._track_lm) else np.zeros((0, 3), np.float32)
        use = dep_ok
        R, t, inl = (None, None, None)
        if use.sum() >= 3:
            R, t, inl_sub = ransac_rigid(
                world[use], cam[use], self._rng, thresh=self.ransac_thresh,
                min_inliers=self.min_inliers)
            if R is not None:
                inl = np.zeros(len(self._track_px), bool)
                inl[np.flatnonzero(use)[inl_sub]] = True
        if R is None:
            # tracking lost this frame: constant-pose fallback (constant-
            # velocity would need the previous delta; identity is the
            # conservative choice), drop dead tracks, try to re-detect
            self.lost_frames += 1
            self._store_pose(frame.index)
            self._prev_gray = gray
            if len(self._track_px) < self.min_inliers:
                self._make_keyframe(frame, gray, lf_image)  # relocalize-ish
            self._capture_vis(gray)
            return None

        self._cur_R, self._cur_t = R, t
        self._store_pose(frame.index)

        # drop RANSAC outliers with valid depth (bad associations)
        keep = ~(use & ~inl)
        self._track_lm = self._track_lm[keep]
        self._track_px = self._track_px[keep]

        packet = None
        if self._need_keyframe(inl.sum()):
            packet = self._make_keyframe(frame, gray, lf_image)

        self._capture_vis(gray, int(inl.sum()))
        self._prev_gray = gray
        return packet

    def _capture_vis(self, gray: np.ndarray, n_inliers: int = 0) -> None:
        """Snapshot for the viewer's SLAM-frame pane (the reference's
        ImGui current-frame + keypoint overlay, viewer/imgui_viewer.cpp)."""
        self.last_vis = dict(gray=gray,
                             pts=np.asarray(self._track_px,
                                            np.float32).copy(),
                             inliers=int(n_inliers))

    def _need_keyframe(self, n_inliers: int) -> bool:
        if n_inliers < self.min_track_ratio * self._last_kf_px_count:
            return True
        last = self.keyframes[self._kf_order[-1]]
        dR = self._cur_R @ last.R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        # camera-center translation
        c_now = -(self._cur_R.T @ self._cur_t)
        c_last = -(last.R.T @ last.t)
        return (np.linalg.norm(c_now - c_last) > self.kf_trans_th or
                ang > self.kf_rot_deg_th)

    # -- keyframe creation ------------------------------------------------
    def _make_keyframe(self, frame: RGBDFrame, gray: np.ndarray,
                       lf_image: Optional[np.ndarray]) -> KeyframePacket:
        fid = frame.index
        R, t = self._cur_R.copy(), self._cur_t.copy()
        kf = _KF(fid=fid, R=R, t=t, gray=gray, color=frame.color,
                 depth=frame.depth)
        self.keyframes[fid] = kf
        self._kf_order.append(fid)
        self.n_keyframes_created += 1

        # observations for surviving tracks at this KF
        cam, ok = self._lift(self._track_px, frame.depth)
        for i in np.flatnonzero(ok):
            self.landmarks[int(self._track_lm[i])].obs[fid] = cam[i]
        n_obs_kf = int(ok.sum())

        # replenish with fresh corners -> new landmarks
        need = self.max_corners - len(self._track_px)
        new_xyz, new_col = [], []
        if need > 0:
            fresh = detect_corners(gray, need, avoid=self._track_px)
            if len(fresh):
                camf, okf = self._lift(fresh, frame.depth)
                fresh, camf = fresh[okf], camf[okf]
                worldf = self._to_world(camf, R, t)
                h, w = gray.shape
                xi = np.clip(fresh[:, 0].astype(int), 0, w - 1)
                yi = np.clip(fresh[:, 1].astype(int), 0, h - 1)
                cols = frame.color[yi, xi].astype(np.float32)
                ids = []
                for j in range(len(fresh)):
                    lm = _Landmark(world=worldf[j], color=cols[j],
                                   obs={fid: camf[j]}, created_kf=fid)
                    self.landmarks[self._next_lm] = lm
                    ids.append(self._next_lm)
                    self._next_lm += 1
                self._track_lm = np.concatenate(
                    [self._track_lm, np.asarray(ids, np.int64)])
                self._track_px = np.concatenate([self._track_px, fresh])
                new_xyz, new_col = worldf, cols
                n_obs_kf += len(fresh)
        # KF-decision reference = depth-valid observations at this KF (what
        # the landmark-anchored solver can actually use downstream)
        self._last_kf_px_count = max(n_obs_kf, 1)

        # local BA over the sliding window, then publish
        updated = self._local_ba()
        packets = [self._packet_for(fid, frame, lf_image)]
        for ufid in updated:
            if ufid != fid:
                packets.append(self._pose_packet(ufid))
        self.queue.push(MappingOperation(
            kind=OpKind.LOCAL_BA, keyframes=packets,
            points_xyz=np.asarray(new_xyz, np.float32).reshape(-1, 3),
            points_color=np.asarray(new_col, np.float32).reshape(-1, 3)))

        if self.enable_loop_closing:
            self._try_loop_close(kf)
        self._cull_keyframes()
        return packets[0]

    def _packet_for(self, fid: int, frame: RGBDFrame,
                    lf_image: Optional[np.ndarray]) -> KeyframePacket:
        kf = self.keyframes[fid]
        # keypoint export (KeyFrame::GetKeypointInfo contract): tracked
        # pixels + camera-local points, z=-1 when the landmark has no depth
        cam, ok = self._lift(self._track_px, frame.depth)
        pts_local = np.where(ok[:, None], cam,
                             np.full_like(cam, -1.0))
        return KeyframePacket(
            fid=fid, timestamp=float(frame.timestamp), R=kf.R, t=kf.t,
            color=kf.color, depth=kf.depth, lf_image=lf_image,
            kp_pixels=self._track_px.copy(), kp_points_local=pts_local)

    def _pose_packet(self, fid: int) -> KeyframePacket:
        kf = self.keyframes[fid]
        return KeyframePacket(
            fid=fid, timestamp=0.0, R=kf.R.copy(), t=kf.t.copy(),
            color=kf.color, depth=kf.depth, lf_image=None)

    # -- local BA ----------------------------------------------------------
    def _local_ba(self) -> list[int]:
        """Sliding-window refinement by block-coordinate descent:
        (a) landmark <- mean of backprojections from ALL observing KFs
        (outside-window observers anchor the gauge), (b) window KF pose <-
        Kabsch(world landmarks -> cam observations). Oldest window KF stays
        fixed. Returns the fids whose pose changed."""
        window = self._kf_order[-self.ba_window:]
        if len(window) < 2:
            return []
        wset = set(window)
        touched = [lm for lm in self.landmarks.values()
                   if any(f in wset for f in lm.obs)]
        for _ in range(self.ba_sweeps):
            for lm in touched:
                pts = []
                for f, camp in lm.obs.items():
                    k = self.keyframes.get(f)
                    if k is not None:
                        pts.append(self._to_world(camp[None], k.R, k.t)[0])
                if pts:
                    lm.world = np.mean(pts, axis=0).astype(np.float32)
            for f in window[1:]:
                k = self.keyframes[f]
                A, B = [], []
                for lm in touched:
                    if f in lm.obs:
                        A.append(lm.world)
                        B.append(lm.obs[f])
                if len(A) >= 6:
                    k.R, k.t = rigid_align(np.asarray(A), np.asarray(B))
        # keep the live tracking pose consistent with the refined newest KF
        newest = self.keyframes[window[-1]]
        self._cur_R, self._cur_t = newest.R.copy(), newest.t.copy()
        return window[1:]

    # -- culling -----------------------------------------------------------
    def _cull_keyframes(self) -> None:
        """ORB-SLAM3 KeyFrameCulling rule, conservatively: a non-recent KF
        whose landmarks are >=cull_redundancy covered by >=4 other KFs is
        removed from the live set (the mapper's cull_keyframes drops it next
        drain). At most ONE cull per new keyframe (the reference also culls
        incrementally per LocalMapping pass) and the recent BA window plus
        the map origin are protected — aggressive culling would erase loop
        anchors and starve the mapper of views."""
        protected = set(self._kf_order[-max(self.ba_window, 3):])
        protected.add(self._kf_order[0])
        for fid in list(self._kf_order):
            if fid in protected:
                continue
            n_obs, n_red = 0, 0
            for lm in self.landmarks.values():
                if fid in lm.obs:
                    n_obs += 1
                    others = sum(1 for f in lm.obs
                                 if f != fid and f in self.keyframes)
                    if others >= 4:
                        n_red += 1
            if n_obs and n_red / n_obs >= self.cull_redundancy:
                self._remove_keyframe(fid)
                break  # one per pass
        if self.max_keyframes_live > 0:
            while len(self._kf_order) > self.max_keyframes_live:
                self._remove_keyframe(self._kf_order[1])
        # landmark GC: no live-KF observation and not actively tracked
        active = set(int(i) for i in self._track_lm)
        dead = [i for i, lm in self.landmarks.items()
                if i not in active and
                not any(f in self.keyframes for f in lm.obs)]
        for i in dead:
            del self.landmarks[i]

    def _remove_keyframe(self, fid: int) -> None:
        self._kf_order.remove(fid)
        kf = self.keyframes.pop(fid, None)
        if kf is not None:  # freeze for trajectory reconstruction
            T = np.eye(4, dtype=np.float32)
            T[:3, :3], T[:3, 3] = kf.R, kf.t
            self._kf_final[fid] = T
        for lm in self.landmarks.values():
            lm.obs.pop(fid, None)
        self.queue.remove_keyframe(fid)

    # -- loop closing --------------------------------------------------
    def _try_loop_close(self, kf: _KF) -> None:
        """Appearance-first loop detection (drift makes a pose-proximity
        gate unreliable — ORB-SLAM3 uses DBoW2 for the same reason), Kabsch
        geometric verification against the loop keyframe's ORIGINAL map
        region, and a rigid world correction propagated to the recent
        window before local BA re-harmonizes it. Publishes a LOOP_CLOSE_BA
        op (LoopClosing.cc:1027-1034 push-site contract)."""
        if len(self._kf_order) <= self.loop_min_gap:
            return
        a = _pool_gray(kf.gray)
        c_now = -(kf.R.T @ kf.t)
        best, best_fid = self.loop_appearance_th, None
        for old_fid in self._kf_order[:-self.loop_min_gap]:
            old = self.keyframes[old_fid]
            c_old = -(old.R.T @ old.t)
            # generous pose gate only to cut absurd candidates; drift-safe
            if np.linalg.norm(c_now - c_old) > 6.0 * self.loop_radius:
                continue
            score = _peak_corr(a, _pool_gray(old.gray))
            if score > best:
                best, best_fid = score, old_fid
        if best_fid is None:
            return
        old = self.keyframes[best_fid]
        # geometric verification: track old-KF corners into this frame
        pts = detect_corners(old.gray, 300)
        cur_px, ok = klt_track(old.gray, kf.gray, pts)
        if ok.sum() < self.min_inliers:
            return
        cam_old, ok_o = self._lift(pts[ok], old.depth)
        cam_new, ok_n = self._lift(cur_px[ok], kf.depth)
        use = ok_o & ok_n
        if use.sum() < self.min_inliers:
            return
        world_old = self._to_world(cam_old[use], old.R, old.t)
        R, t, inl = ransac_rigid(world_old, cam_new[use], self._rng,
                                 thresh=self.ransac_thresh,
                                 min_inliers=self.min_inliers)
        if R is None or inl.sum() < 2 * self.min_inliers:
            return
        # world correction W: drifted world -> loop-consistent world, from
        # the current KF's drifted vs corrected pose. Drift accumulated
        # gradually since the loop anchor, so distribute W along the KF
        # chain anchor->current with fractional screw interpolation — the
        # lightweight stand-in for the reference's essential-graph
        # optimization (Optimizer.cc OptimizeEssentialGraph).
        T_drift = np.eye(4, dtype=np.float32)
        T_drift[:3, :3], T_drift[:3, 3] = kf.R, kf.t
        T_corr = np.eye(4, dtype=np.float32)
        T_corr[:3, :3], T_corr[:3, 3] = R, t
        W = np.linalg.inv(T_corr) @ T_drift
        a_idx = self._kf_order.index(best_fid)
        chain = self._kf_order[a_idx + 1:]
        if not chain:
            return
        chain_set = set(chain)
        for j, f in enumerate(chain):
            s = (j + 1) / len(chain)
            W_s = _fractional_rigid(W, s)
            k = self.keyframes[f]
            Tk = np.eye(4, dtype=np.float32)
            Tk[:3, :3], Tk[:3, 3] = k.R, k.t
            Tk = Tk @ np.linalg.inv(W_s)
            k.R, k.t = Tk[:3, :3].astype(np.float32), \
                Tk[:3, 3].astype(np.float32)
        # re-triangulate landmarks touched by the chain from their
        # corrected observers (one landmark sweep of the BA alternation)
        for lm in self.landmarks.values():
            if any(f in chain_set for f in lm.obs):
                pts = [self._to_world(camp[None], self.keyframes[f].R,
                                      self.keyframes[f].t)[0]
                       for f, camp in lm.obs.items() if f in self.keyframes]
                if pts:
                    lm.world = np.mean(pts, axis=0).astype(np.float32)
        self._cur_R, self._cur_t = kf.R.copy(), kf.t.copy()
        self._store_pose(kf.fid)
        self._local_ba()
        packets = [self._pose_packet(f)
                   for f in chain[-self.ba_window:]]
        for p in packets:
            p.is_loop_kf = True
        self.queue.push(MappingOperation(
            kind=OpKind.LOOP_CLOSE_BA, keyframes=packets))
        self.n_loop_closures += 1

    # -- trajectory / lifecycle -----------------------------------------
    def trajectory(self) -> tuple[np.ndarray, np.ndarray]:
        """(frame_ids [N], c2w [N,4,4]) for every processed frame, each
        reconstructed from its reference keyframe's CURRENT (BA / loop-
        corrected) pose so late corrections retro-apply to the history."""
        fids = np.asarray(sorted(self.poses), np.int64)
        out = []
        for f in fids:
            f = int(f)
            ref = self._frame_ref.get(f)
            if ref is not None:
                ref_fid, T_rel = ref
                kf = self.keyframes.get(ref_fid)
                if kf is not None:
                    T_kf = np.eye(4, dtype=np.float32)
                    T_kf[:3, :3], T_kf[:3, 3] = kf.R, kf.t
                elif ref_fid in self._kf_final:
                    T_kf = self._kf_final[ref_fid]
                else:
                    out.append(self.poses[f])
                    continue
                out.append(np.linalg.inv(T_rel @ T_kf).astype(np.float32))
            else:
                out.append(self.poses[f])
        return fids, np.stack(out)

    def finish(self) -> None:
        self.queue.shutdown()

    @property
    def num_keyframes(self) -> int:
        return len(self._kf_order)


def _fractional_rigid(T: np.ndarray, s: float) -> np.ndarray:
    """Fractional rigid transform: rotation scaled on its axis-angle,
    translation scaled linearly (first-order screw interpolation)."""
    R = T[:3, :3]
    cos_a = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.arccos(cos_a)
    if ang < 1e-8:
        Rs = np.eye(3, dtype=np.float32)
    else:
        axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                         R[1, 0] - R[0, 1]]) / (2.0 * np.sin(ang))
        a = s * ang
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]], np.float32)
        Rs = np.eye(3, dtype=np.float32) + np.sin(a) * K + \
            (1 - np.cos(a)) * (K @ K)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = Rs
    out[:3, 3] = s * T[:3, 3]
    return out


def _pool_gray(gray: np.ndarray, f: int = 4) -> np.ndarray:
    """Box-pooled zero-mean float image (loop-descriptor preprocessing)."""
    h, w = gray.shape
    g = gray[:h // f * f, :w // f * f].astype(np.float32)
    g = g.reshape(h // f, f, w // f, f).mean((1, 3))
    return g - g.mean()


def _peak_corr(a: np.ndarray, b: np.ndarray) -> float:
    """Max normalized cross-correlation over 2D shifts (FFT). Used as the
    loop-closure appearance score: in-place revisits differ mostly by an
    image-space shift, which plain ZNCC cannot absorb (the reference uses
    DBoW2 bag-of-words for the same shift/viewpoint invariance)."""
    A = np.fft.rfft2(a)
    B = np.fft.rfft2(b)
    cc = np.fft.irfft2(A * np.conj(B), s=a.shape)
    return float(cc.max() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-6))
