"""Online Gaussian mapper: the orchestration layer (GaussianMapper, C10).

Reproduces the reference's 3-phase lifecycle (src/gaussian_mapper.cpp:361-554):

  Phase 1  initial mapping: wait for >= min_num_initial_map_kfs keyframes,
           snapshot sparse colored points, create the store
           (createFromPcd), compute the nerf++ camera extent, first
           training iteration.
  Phase 2  incremental: drain MappingOperations (new keyframes, BA pose
           updates, loop-closure surgery, scale refinement) and run one
           training iteration per tick (trainForOneIteration,
           :624-798).
  Phase 3  tail optimization after SLAM shutdown, then artifact dump.

The device-side work is the static-shape jitted step (mapper/train_step.py)
plus episodic densify/prune/opacity-reset (models/gaussians.py), so the
Python here is pure scheduling — it never triggers a re-jit as the map
grows.
"""
from __future__ import annotations

import json
import logging
import os
import random
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import (
    MapperParams,
    OptimizationParams,
    RasterizeConfig,
)
from legslam_tpu.mapper.keyframe import MapKeyframe, build_keyframe
from legslam_tpu.mapper.train_step import train_step, upsample_lf
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops import losses
from legslam_tpu.ops.rasterize import compute_binning, rasterize
from legslam_tpu.slam.interface import MappingOperation, OpKind
from legslam_tpu.utils import ply
from legslam_tpu.utils.camera import CameraView, focal2fov
from legslam_tpu.utils.undistort import build_undistortion


_binning_jit = jax.jit(
    compute_binning,
    static_argnames=("width", "height", "cfg", "max_per_tile"))

from legslam_tpu.ops.binning import trim_binning as _trim_binning  # noqa: E402

_trim_binning_jit = jax.jit(
    _trim_binning, static_argnames=("max_pairs", "chunk", "slack_chunks"))

# Static-shape jitted point ingest. increase_pcd traces over the batch
# size, so calling it eagerly with the raw per-keyframe point count (a
# DIFFERENT n every frame) compiles a fresh executable per keyframe —
# measured 12-98 s per keyframe over the axon tunnel, 288 of 326 s of a
# profiled 18-frame system run. Batches are padded to a power-of-two
# bucket (point_valid masks the tail all the way through the 3-NN scale
# init, so real rows are BIT-IDENTICAL to an unpadded call) giving a
# handful of cached executables total.
# packed [m, 8] upload (xyz | rgb | valid | smax): ONE host->device
# transfer per ingest instead of four (each staged transfer costs ~4 ms
# over the tunnel), unpacked inside the jit.
_ingest_jit = jax.jit(
    lambda state, packed, iteration: G.increase_pcd(
        state, packed[:, 0:3], packed[:, 3:6], iteration,
        point_valid=packed[:, 6] > 0.5, max_log_scale=packed[:, 7]))

_INGEST_MIN_BUCKET = 1024

# Episodic store surgery, jitted: static capacity shapes, so each compiles
# once; run eagerly they cost hundreds of ~19 ms dispatches over the axon
# tunnel every densification_interval.
_upsample_lf_jit = jax.jit(upsample_lf, static_argnums=(1, 2))

_densify_jit = jax.jit(G.densify_and_prune)
_reset_opacity_jit = jax.jit(G.reset_opacity)


def _ingest_bucket(n: int, capacity: int) -> int:
    b = max(_INGEST_MIN_BUCKET, 1 << max(n - 1, 1).bit_length())
    return max(_INGEST_MIN_BUCKET, min(b, capacity))


def nerfpp_norm(cam_centers: np.ndarray) -> tuple[np.ndarray, float]:
    """Scene translate/radius: 1.1 x max distance from the camera-center
    centroid (gaussian_scene.cpp getNerfppNorm)."""
    center = cam_centers.mean(axis=0)
    dists = np.linalg.norm(cam_centers - center, axis=-1)
    radius = float(dists.max() * 1.1) if len(dists) else 1.0
    return -center, max(radius, 1e-6)


def rotation_angle_deg(R: np.ndarray) -> float:
    c = (np.trace(R) - 1.0) * 0.5
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


class GaussianMapper:
    def __init__(self, source, intrinsics: dict,
                 opt: Optional[OptimizationParams] = None,
                 mp: Optional[MapperParams] = None,
                 cfg: Optional[RasterizeConfig] = None,
                 capacity: int = 1 << 18,
                 result_dir: str = "./output",
                 max_per_tile: int = 2048,
                 seed: int = 0,
                 include_lang_feat: bool = True,
                 binning_refresh_interval: int = 1,
                 binning_cache_entries: int = 16,
                 binning_trim: bool = True,
                 binning_trim_fresh: bool = True,
                 binning_keep_on_ingest: bool = True,
                 capacity_ladder: bool = True,
                 sensor_type: str = "rgbd",
                 n_views: int = 1,
                 spatial_strips: int = 1,
                 shard_store: bool = False,
                 mesh=None):
        self.source = source
        self.intr = intrinsics
        self.opt = opt or OptimizationParams()
        self.mp = mp or MapperParams()
        self.cfg = cfg or RasterizeConfig()
        self.capacity = capacity          # ladder MAX (current = state)
        # Geometric capacity ladder: the reference grows its parameter
        # tensors as the map densifies; the static-shape equivalent
        # starts the store at a small rung and re-pads x4 (grow_capacity)
        # at 60% occupancy. An early online store (~1-10k points) then
        # stops paying full-capacity P-bound step costs and full
        # max_pairs sort buffers; each rung's executables compile once
        # and persist in the compilation cache. Single-device path only
        # (the sharded/spatial/batched paths pin shapes to `capacity`).
        self.capacity_ladder = capacity_ladder and n_views == 1 and \
            spatial_strips == 1 and not shard_store
        self._approx_valid = 0
        self._base_max_pairs = self.cfg.max_pairs
        self._pairs_floor = 0   # overflow-escalated max_pairs floor
        # (iteration, [changes]) log of overflow-ladder escalations —
        # observability for benches/tools (logging.info alone is
        # invisible under default logger config)
        self.overflow_escalations: list[tuple[int, list[str]]] = []
        self.result_dir = result_dir
        self.max_per_tile = max_per_tile
        self.include_lang_feat = include_lang_feat
        if sensor_type not in ("rgbd", "monocular", "stereo"):
            raise ValueError(f"unsupported sensor type {sensor_type!r}")
        self.sensor_type = sensor_type

        self.state: Optional[G.GaussianState] = None
        self.keyframes: dict[int, MapKeyframe] = {}
        self.iteration = 0
        self.active_sh_degree = 0
        self.cameras_extent = 1.0
        self.scene_translate = np.zeros(3, np.float32)
        self.bg = jnp.zeros(3, jnp.float32)
        self.key = jax.random.key(seed)
        self._rng = random.Random(seed)
        self._kf_cycle: list[int] = []
        self._pending_points: list[tuple[np.ndarray, np.ndarray]] = []
        self._depth_cache: list[tuple[np.ndarray, np.ndarray]] = []
        self._kfs_since_densify_flush = 0
        self.ema_loss = 0.0
        # undistortion maps + valid mask from intrinsics dist_coeffs
        # (camera.h:68-100; None for the pure-pinhole case). Incoming
        # keyframe RGB/depth are remapped and the mask gates the loss
        # (gaussian_mapper.cpp:399-432, 711-721); kp_pixels are already
        # undistorted per the bridge contract (KeyFrame::GetKeypointInfo).
        self.undistortion = build_undistortion(intrinsics)
        self.timings: list[float] = []
        self.big_points_on = False
        self.loss_sync_interval = 10
        self._last_aux = None
        # per-(kf, level) tile-binning cache: the sort-dominated half of the
        # prep pipeline depends only on geometry, which drifts slowly
        # between consecutive uses of the same keyframe. interval=1 (the
        # default) recomputes every step — exact reference semantics; >1
        # reuses an entry for that many uses and is invalidated outright on
        # any store surgery (densify/prune/increase/reset/loop-closure) or
        # pose update. Bounded LRU so HBM stays O(entries * max_pairs).
        self.binning_refresh_interval = binning_refresh_interval
        self.binning_cache_entries = binning_cache_entries
        self._binning_cache: dict = {}
        # termination-aware trim of cached binnings (ops/binning.py
        # trim_binning): the refresh step emits the forward kernel's
        # per-tile T<1e-4 watermark, and pairs past it — which contributed
        # zero color and zero gradient at the measured state — are
        # compacted away before the reuse steps, so the row-rate-bound
        # pair gather/scatter engine and both compositing kernels skip
        # them. Same staleness class as the cache itself. Pallas flat
        # (n_buckets=1) single-view path only.
        self.binning_trim = binning_trim
        # pure point-ADD surgery (keyframe ingest / inactive-geo densify)
        # leaves cached binnings valid-but-stale: existing slots are
        # untouched (the scatter only fills FREE slots), so a cached
        # binning merely misses the new points until its refresh — the
        # same staleness class as the refresh interval itself. Online
        # ingest arrives every few frames; invalidating on each add made
        # EVERY system-loop step pay the fresh-binning cost (measured
        # ~300+ ms/frame device time vs ~90 ms steady state). Prune /
        # loop-closure / opacity-reset surgery still invalidates: those
        # rewrite live slots a cached pair list points into.
        self.binning_keep_on_ingest = binning_keep_on_ingest
        self._binning_fresh = False
        # ALSO pre-trim the group-leading (fresh-binning) step with the
        # view's PREVIOUS watermark (+1 extra slack chunk): without this
        # the refresh step composites/gathers the full untrimmed pair set
        # just to re-measure a watermark that drifts by ~a chunk per
        # group. One group staler than the reuse trim — same staleness
        # class. A kfin measured on a pre-trimmed binning is itself
        # capped at the trim bound, so every `trim_fresh_max_age + 1`-th
        # refresh of a key runs untrimmed to re-measure in full (bounds
        # the ratchet; discontinuities — densify/prune/reset/surgery —
        # clear the watermark store via _invalidate_binning).
        self.binning_trim_fresh = binning_trim_fresh
        self.trim_fresh_max_age = 3
        self._kfin_cache: dict = {}
        # multi-view batched mapping (TPU-native scaling axis, SURVEY §5):
        # each tick drains n_views keyframes through ONE data-parallel
        # step on the device mesh — per-view render/loss/grad in parallel,
        # gradients mean-reduced over ICI, replicated Adam update. On a
        # single device the batch still runs (vmap), trading per-iteration
        # coverage for fewer dispatches. n_views=1 keeps the exact
        # reference one-KF-per-iteration semantics.
        if n_views < 1:
            raise ValueError(f"n_views must be >= 1, got {n_views}")
        self.n_views = n_views
        # spatial (tile-row) sharding of the single-view step
        # (parallel/spatial.py): the image splits into `spatial_strips`
        # whole-tile-row strips, each rendered + differentiated on its own
        # device — accelerating the latency-critical one-keyframe
        # iteration itself (vs n_views, which batches ACROSS keyframes).
        if spatial_strips < 1:
            raise ValueError(
                f"spatial_strips must be >= 1, got {spatial_strips}")
        self.spatial_strips = spatial_strips
        # capacity-sharded (FSDP-style) store (parallel/capacity.py):
        # persistent store memory ~1/D per device. Composes with
        # spatial_strips (store + pixels shard over the same axis) but
        # also stands alone on a plain 1D data mesh — the single-view
        # step then all-gathers the render working set inside the loss
        # (train_step gather_mesh) and keeps Adam/stats sharded.
        self.shard_store = shard_store
        self._mesh = mesh
        if mesh is None and n_views > 1 and spatial_strips > 1:
            # combined ('data', 'strip') 2D mesh when enough devices
            # exist; with fewer devices fall back to a data-parallel mesh
            # over the views (the strip axis then runs as a vmap within
            # each device) rather than silently losing all parallelism
            from legslam_tpu.parallel import spatial as sp
            if len(jax.devices()) >= n_views * spatial_strips:
                self._mesh = sp.make_mesh2d(n_views, spatial_strips)
            else:
                from legslam_tpu.parallel import sharded
                nd = min(len(jax.devices()), n_views)
                while n_views % nd:
                    nd -= 1
                if nd > 1:
                    self._mesh = sharded.make_mesh(nd)
        elif mesh is None and (n_views > 1 or spatial_strips > 1):
            from legslam_tpu.parallel import sharded
            nd = len(jax.devices())
            # largest mesh that divides the batch/strips evenly
            size = n_views if n_views > 1 else spatial_strips
            while size % nd:
                nd -= 1
            self._mesh = sharded.make_mesh(nd)
        elif mesh is None and shard_store:
            # store-only sharding: 1D data mesh over every device whose
            # count divides the (power-of-two) capacity
            from legslam_tpu.parallel import sharded
            nd = len(jax.devices())
            while capacity % nd:
                nd -= 1
            if nd > 1:
                self._mesh = sharded.make_mesh(nd)

    # ------------------------------------------------------------------
    # Bridge ingestion (combineMappingOperations, gaussian_mapper.cpp:829)
    # ------------------------------------------------------------------
    def _ingest_keyframe(self, packet) -> None:
        mp = self.mp
        if packet.fid in self.keyframes:
            kf = self.keyframes[packet.fid]
            old_R, old_t = kf.R.copy(), kf.t.copy()
            kf.set_pose(packet.R, packet.t, self.intr["fx"], self.intr["fy"])
            kf.remaining_times_of_use += mp.local_BA_increased_times_of_use
            return
        mask_full = None
        if self.undistortion is not None:
            import dataclasses as _dc
            und = self.undistortion
            packet = _dc.replace(
                packet, color=und.undistort_image(packet.color),
                depth=None if packet.depth is None
                else und.undistort_image(packet.depth))
            mask_full = und.valid_mask
        kf = build_keyframe(
            packet, self.intr, mp.num_gaus_pyramid_sub_levels
            if mp.do_gaus_pyramid_training else 0,
            mp.gaus_pyramid_times_of_use,
            mp.new_keyframe_times_of_use, self.iteration,
            mask_full=mask_full)
        self.keyframes[packet.fid] = kf
        if mp.do_inactive_geo_densify:
            self._cache_inactive_geometry(kf, packet)

    def _cache_inactive_geometry(self, kf: MapKeyframe, packet=None) -> None:
        """Sensor-specific inactive-geometry densification
        (increasePcdByKeyframeInactiveGeoDensify,
        gaussian_mapper.cpp:1253-1492): keypoints without map points get
        their depth from the sensor — RGBD reads the depth image, MONOCULAR
        borrows the nearest keypoint's depth within max_pixel_dist
        (stereo_vision.cu:63-139), STEREO runs SGM on the rectified pair
        (gaussian_mapper.cpp:1302-1405) — and are cached; every
        `depth_cache` keyframes the batch goes into the model."""
        if kf.kp_pixels is None:
            return
        if self.sensor_type == "monocular":
            world, cols, z = self._mono_inactive_geometry(kf)
        elif self.sensor_type == "stereo":
            world, cols, z = self._stereo_inactive_geometry(kf, packet)
        else:
            world, cols, z = self._rgbd_inactive_geometry(kf, packet)
        kf.done_inactive_geo_densify = True
        if world is None or not len(world):
            return
        self._depth_cache.append((world.astype(np.float32),
                                  cols.astype(np.float32),
                                  self._ingest_smax(z)))
        self._kfs_since_densify_flush += 1
        if self._kfs_since_densify_flush >= self.mp.depth_cache:
            self._flush_depth_cache()

    def _rgbd_inactive_geometry(self, kf: MapKeyframe, packet=None):
        if kf.gt_depth is None:
            return None, None, None
        # the packet still holds the host copies — reading those avoids a
        # ~13 MB device->host fetch per keyframe (19 ms+ tunnel trips)
        if packet is not None and packet.depth is not None:
            depth = np.asarray(packet.depth, np.float32)
            color = np.asarray(packet.color, np.float32)
        else:
            depth = np.asarray(kf.gt_depth[-1])
            color = np.asarray(kf.gt_color[-1])
        h, w = depth.shape
        kp = kf.kp_pixels
        has_mp = kf.kp_points_local is not None and \
            (kf.kp_points_local[:, 2] > 0)
        xi = np.clip(kp[:, 0].astype(int), 0, w - 1)
        yi = np.clip(kp[:, 1].astype(int), 0, h - 1)
        d = depth[yi, xi]
        ok = (~has_mp) & (d > self.mp.rgbd_min_depth) & \
            (d < self.mp.rgbd_max_depth)
        if not ok.any():
            return None, None, None
        fx, fy = self.intr["fx"], self.intr["fy"]
        cx, cy = self.intr["cx"], self.intr["cy"]
        # scale intrinsics to stored full-res level
        sx = w / self.intr["width"]
        sy = h / self.intr["height"]
        cam = np.stack([(kp[ok, 0] - cx * sx) / (fx * sx) * d[ok],
                        (kp[ok, 1] - cy * sy) / (fy * sy) * d[ok],
                        d[ok]], -1)
        world = (cam - kf.t) @ kf.R
        cols = color[yi[ok], xi[ok]]
        return world, cols, d[ok]

    def _mono_inactive_geometry(self, kf: MapKeyframe):
        """Monocular depth-borrow branch (gaussian_mapper.cpp:1262-1300)."""
        from legslam_tpu.ops.stereo import mono_borrow_depth
        if kf.kp_points_local is None:
            return None, None, None
        kp = jnp.asarray(kf.kp_pixels)
        local = np.asarray(kf.kp_points_local)
        has3d = local[:, 2] > 0
        if not has3d.any() or has3d.all():
            return None, None, None
        pts, ok = mono_borrow_depth(
            kp, jnp.asarray(local[:, 2]), jnp.asarray(has3d),
            self.mp.mono_max_pixel_dist, self.intr["fx"], self.intr["fy"],
            self.intr["cx"], self.intr["cy"])
        pts = np.asarray(pts)
        ok = np.asarray(ok)
        if not ok.any():
            return None, None, None
        world = (pts[ok] - kf.t) @ kf.R
        color = np.asarray(kf.gt_color[-1])
        h, w = color.shape[:2]
        xi = np.clip(kf.kp_pixels[ok, 0].astype(int), 0, w - 1)
        yi = np.clip(kf.kp_pixels[ok, 1].astype(int), 0, h - 1)
        return world, color[yi, xi], pts[ok, 2]

    def _stereo_inactive_geometry(self, kf: MapKeyframe, packet):
        """Stereo SGM branch (gaussian_mapper.cpp:1302-1405)."""
        if packet is None or getattr(packet, "color_right", None) is None:
            return None, None, None
        from legslam_tpu.ops.stereo import stereo_inactive_geo_densify
        baseline = self.intr.get("stereo_baseline", 0.0)
        if baseline <= 0:
            return None, None, None
        pts, cols, ok = stereo_inactive_geo_densify(
            jnp.asarray(packet.color), jnp.asarray(packet.color_right),
            jnp.asarray(kf.kp_pixels), self.intr["fx"], self.intr["fy"],
            self.intr["cx"], self.intr["cy"], baseline,
            num_disp=self.mp.stereo_num_disparity,
            min_disp=self.mp.stereo_min_disparity)
        pts, cols, ok = np.asarray(pts), np.asarray(cols), np.asarray(ok)
        if not ok.any():
            return None, None, None
        world = (pts[ok] - kf.t) @ kf.R
        return world, cols[ok], pts[ok, 2]

    def _increase_points(self, pts: np.ndarray, cols: np.ndarray,
                         smax: np.ndarray | None = None) -> None:
        """Ingest new points through the static-shape bucketed executable
        (see _ingest_jit): pad to the bucket, mask the tail. `smax` is the
        per-point log-scale cap (ingest_scale_clamp_px); +inf = no cap."""
        n = pts.shape[0]
        if self.capacity_ladder:
            # grow BEFORE allocating so points are never dropped at a
            # rung that the ladder would have grown past anyway
            while (self.state.capacity < self.capacity and
                   self._approx_valid + n > 0.6 * self.state.capacity):
                self.state = G.grow_capacity(
                    self.state, min(self.state.capacity * 4,
                                    self.capacity))
                self._ladder_cfg(self.state.capacity)
                self._invalidate_binning()
        m = _ingest_bucket(n, self.state.capacity)
        k = min(n, m)
        packed = np.zeros((m, 8), np.float32)
        packed[:, 7] = np.inf
        packed[:k, 0:3] = pts[:k]
        packed[:k, 3:6] = cols[:k]
        packed[:k, 6] = 1.0
        if smax is not None:
            packed[:k, 7] = smax[:k]
        if n > m:  # beyond capacity: count the tail as overflow-dropped
            self.state = self.state.replace(
                overflow_dropped=self.state.overflow_dropped + (n - m))
        self.state = _ingest_jit(
            self.state, jnp.asarray(packed),
            jnp.asarray(self.iteration, jnp.int32))
        self._approx_valid = min(self._approx_valid + k,
                                 self.state.capacity)
        if not (self.binning_keep_on_ingest and
                self.binning_refresh_interval > 1):
            self._invalidate_binning()

    def _ingest_smax(self, z: np.ndarray | None) -> np.ndarray | None:
        """Per-point log-scale cap from camera depth: screen radius
        3*scale*f/z <= ingest_scale_clamp_px (the prune-big size_th bound
        applied at creation; gaussian_mapper.cpp:737-755)."""
        px = self.mp.ingest_scale_clamp_px
        if z is None or px <= 0:
            return None
        zc = np.maximum(np.asarray(z, np.float32), 1e-3)
        return np.log((px / 3.0) * zc / self.intr["fx"]).astype(np.float32)

    def _flush_depth_cache(self) -> None:
        if not self._depth_cache or self.state is None:
            self._kfs_since_densify_flush = 0
            return
        pts = np.concatenate([p for p, _, _ in self._depth_cache])
        cols = np.concatenate([c for _, c, _ in self._depth_cache])
        smax = [m for _, _, m in self._depth_cache]
        smax = np.concatenate([np.full((len(p),), np.inf, np.float32)
                               if m is None else m
                               for (p, _, _), m in zip(self._depth_cache,
                                                       smax)])
        self._depth_cache.clear()
        self._kfs_since_densify_flush = 0
        if pts.shape[0] >= self.mp.min_num_inactive_geo_densify:
            self._increase_points(pts, cols, smax)

    def handle_operation(self, op: MappingOperation) -> None:
        if op.kind == OpKind.LOCAL_BA:
            for packet in op.keyframes:
                self._ingest_keyframe(packet)
            if op.points_xyz is not None and len(op.points_xyz) >= \
                    self.mp.min_num_inactive_geo_densify:
                if self.state is not None:
                    pts_w = np.asarray(op.points_xyz, np.float32)
                    z = None
                    if op.keyframes:
                        pk = op.keyframes[-1]
                        z = pts_w @ pk.R[2] + pk.t[2]  # depth in newest KF
                    self._increase_points(
                        pts_w, np.asarray(op.points_color, np.float32),
                        self._ingest_smax(z))
                else:
                    self._pending_points.append(
                        (op.points_xyz, op.points_color))
            elif op.points_xyz is not None and self.state is None:
                self._pending_points.append(
                    (op.points_xyz, op.points_color))
        elif op.kind == OpKind.LOOP_CLOSE_BA:
            self._handle_loop_closure(op)
        elif op.kind == OpKind.SCALE_REFINEMENT:
            self._handle_scale_refinement(op)

    def _handle_loop_closure(self, op: MappingOperation) -> None:
        """Per-KF pose-delta check -> masked point surgery
        (gaussian_mapper.cpp:878-979)."""
        if self.state is None:
            for packet in op.keyframes:
                self._ingest_keyframe(packet)
            return
        not_transformed = jnp.ones((self.state.capacity,), bool)
        for packet in op.keyframes:
            old = self.keyframes.get(packet.fid)
            if old is None:
                self._ingest_keyframe(packet)
                continue
            old_w2c = np.eye(4, dtype=np.float32)
            old_w2c[:3, :3], old_w2c[:3, 3] = old.R, old.t
            new_w2c = np.eye(4, dtype=np.float32)
            new_w2c[:3, :3], new_w2c[:3, 3] = packet.R, packet.t
            diff = np.linalg.inv(new_w2c) @ old_w2c  # old-cam -> new-cam in world
            # per-KF Sim(3) scale (monocular essential graph) on top of
            # the op-level scale; the surgery applies x' = s*R_diff x +
            # diff_t, so the Sim(3)-exact translation is
            # s * R_wc_new @ t_cw_old + t_wc_new (reduces to the SE(3)
            # diff when s == 1)
            eff_scale = float(op.scale) * float(
                getattr(packet, "scale", 1.0) or 1.0)
            diff_t = eff_scale * (packet.R.T @ old.t) - \
                packet.R.T @ packet.t
            big_rot = rotation_angle_deg(diff[:3, :3]) > self.mp.large_rot_th
            big_trans = np.linalg.norm(diff[:3, 3]) > self.mp.large_trans_th
            big_scale = abs(eff_scale - 1.0) > 0.01
            if big_rot or big_trans or big_scale:
                w2v = jnp.asarray(old_w2c)
                self.state, not_transformed, _ = G.transform_visible_points(
                    self.state, not_transformed,
                    jnp.asarray(diff[:3, :3]),
                    jnp.asarray(diff_t.astype(np.float32)),
                    w2v, old.creation_iter,
                    self.mp.stable_num_iter_existence, eff_scale)
            old.set_pose(packet.R, packet.t, self.intr["fx"],
                         self.intr["fy"])
            old.remaining_times_of_use += \
                self.mp.loop_closure_increased_times_of_use
        self._invalidate_binning()

    def _handle_scale_refinement(self, op: MappingOperation) -> None:
        """applyScaledTransformation over the whole map with the op's full
        similarity (gaussian_mapper.cpp:982-1016): the rigid part is the
        world-frame delta of the first already-known keyframe's corrected
        pose (x_new = inv(T_new) @ T_old @ x_old with the scale applied),
        matching how the reference transports the map into the refined
        world frame; pure-scale IMU refinements have identity delta."""
        diff_R, diff_t = np.eye(3, dtype=np.float32), \
            np.zeros(3, dtype=np.float32)
        for packet in op.keyframes:
            old = self.keyframes.get(packet.fid)
            if old is not None:
                old_w2c = np.eye(4, dtype=np.float32)
                old_w2c[:3, :3], old_w2c[:3, 3] = old.R, old.t
                new_w2c = np.eye(4, dtype=np.float32)
                new_w2c[:3, :3], new_w2c[:3, 3] = packet.R, packet.t
                diff = np.linalg.inv(new_w2c) @ old_w2c
                diff_R, diff_t = diff[:3, :3], diff[:3, 3]
                break
        if self.state is not None:
            self.state = G.apply_scaled_transformation(
                self.state, op.scale, jnp.asarray(diff_R),
                jnp.asarray(diff_t))
        self._invalidate_binning()
        for packet in op.keyframes:
            self._ingest_keyframe(packet)

    # ------------------------------------------------------------------
    # Phases (run, gaussian_mapper.cpp:361-554)
    # ------------------------------------------------------------------
    def has_met_initial_conditions(self) -> bool:
        return (len(self.keyframes) >= self.mp.min_num_initial_map_kfs or
                (self.source.is_shutdown() and len(self.keyframes) > 0))

    def initialize_map(self) -> None:
        pts = [p for p, _ in self._pending_points]
        cols = [c for _, c in self._pending_points]
        self._pending_points.clear()
        if pts:
            xyz = np.concatenate(pts)
            rgb = np.concatenate(cols)
        else:
            xyz = np.zeros((0, 3), np.float32)
            rgb = np.zeros((0, 3), np.float32)
        n = min(xyz.shape[0], self.capacity)
        cap0 = self.capacity
        if self.capacity_ladder:
            need = 1 << max(n * 2 - 1, 1).bit_length()
            cap0 = min(self.capacity, max(1 << 15, need))
        self.state = G.create_from_pcd(xyz[:n], rgb[:n], cap0)
        self._approx_valid = n
        if self.capacity_ladder:
            self._ladder_cfg(cap0)
        centers = []
        for kf in self.keyframes.values():
            centers.append(-(kf.R.T @ kf.t))
        self.scene_translate, self.cameras_extent = nerfpp_norm(
            np.asarray(centers, np.float32))

    def drain_operations(self, limit: int = 32) -> None:
        for _ in range(limit):
            op = self.source.pop_operation()
            if op is None:
                break
            self.handle_operation(op)
        if self.mp.cull_keyframes:
            self.cull_keyframes()

    def cull_keyframes(self) -> None:
        """Drop mapper keyframes the SLAM frontend no longer tracks
        (gaussian_mapper.cpp:1235-1251)."""
        live = None
        getter = getattr(self.source, "live_keyframe_ids", None)
        if getter is None:
            return
        live = getter()
        if not live:
            return
        for fid in [f for f in self.keyframes if f not in live]:
            del self.keyframes[fid]

    def _pick_keyframe(self) -> Optional[MapKeyframe]:
        """Shuffled times-of-use scheduler
        (useOneRandomSlidingWindowKeyframe, gaussian_mapper.cpp:1158-1204)."""
        if not self.keyframes:
            return None
        self._kf_cycle = [f for f in self._kf_cycle if f in self.keyframes]
        if not self._kf_cycle:
            usable = [f for f, kf in self.keyframes.items()
                      if kf.remaining_times_of_use > 0]
            if not usable:
                for kf in self.keyframes.values():
                    kf.remaining_times_of_use += 1
                usable = list(self.keyframes)
            self._rng.shuffle(usable)
            self._kf_cycle = usable
        fid = self._kf_cycle.pop()
        kf = self.keyframes[fid]
        kf.remaining_times_of_use = max(kf.remaining_times_of_use - 1, 0)
        kf.record["used"] = kf.record.get("used", 0) + 1
        return kf

    def _invalidate_binning(self) -> None:
        self._binning_cache.clear()
        self._kfin_cache.clear()

    def _cached(self, key, compute, uses: Optional[int] = None):
        """Refresh-counted LRU entry in the binning cache: reuse `uses`
        times (default binning_refresh_interval) before recomputing."""
        entry = self._binning_cache.pop(key, None)
        if entry is not None and entry[0] > 0:
            uses_left, value = entry
            self._binning_cache[key] = (uses_left - 1, value)
            return value
        value = compute()
        n = self.binning_refresh_interval if uses is None else uses
        self._binning_cache[key] = (n - 1, value)
        while len(self._binning_cache) > self.binning_cache_entries:
            self._binning_cache.pop(next(iter(self._binning_cache)))
        return value

    def _get_binning(self, kf: MapKeyframe, lvl: int, view) -> Optional[tuple]:
        """Cached (binning, overflow) for (kf, level), refreshed every
        `binning_refresh_interval` uses; None when caching is off.
        Sets `_binning_fresh` when this call recomputed the entry (the
        caller may then trim it from the step's kfin watermark)."""
        if self.binning_refresh_interval <= 1:
            self._binning_fresh = False
            return None
        entry = self._binning_cache.get((kf.fid, lvl))
        self._binning_fresh = entry is None or entry[0] <= 0

        def compute():
            st = self.state
            return _binning_jit(
                st.params.xyz, jnp.exp(st.params.scaling),
                st.params.rotation, st.valid, view.world_view,
                view.full_proj, view.tan_fovx, view.tan_fovy,
                width=view.width, height=view.height, cfg=self.cfg,
                max_per_tile=self.max_per_tile,
                opacity=jax.nn.sigmoid(st.params.opacity[:, 0]))

        return self._cached((kf.fid, lvl), compute)

    def _spatial_step(self, kf, lvl: int, view, gt_color, gt_lf, gt_depth,
                      mask, include_lf: bool, lr_step: int):
        """Single-view step, tile-row-sharded over the mesh
        (parallel/spatial.py; exact same semantics as train_step)."""
        from legslam_tpu.parallel import spatial, sharded
        layout = spatial.spatial_layout(view.height, self.cfg.tile_h,
                                        self.spatial_strips)
        mesh = self._mesh if self._mesh is not None and \
            self._mesh.devices.size > 1 else None
        # the padded + row-sharded GT is a pure function of (kf, level):
        # cache it so the latency-critical single-keyframe step doesn't
        # re-pad and re-device_put ~4 image tensors every iteration
        def compute_gt():
            cys = spatial.strip_offsets(layout, mesh)
            if include_lf:
                lf = spatial.pad_rows(gt_lf, layout.h_padded)
            else:
                lf = jnp.zeros((layout.h_padded, view.width, 1),
                               jnp.float32)
            pads = [spatial.pad_rows(a, layout.h_padded)
                    for a in (gt_color, gt_depth, mask)]
            if mesh is not None:
                pads = spatial.shard_rows(pads, mesh)
                lf = spatial.shard_rows(lf, mesh)
            return cys, lf, pads

        cys, gt_lf, pads = self._cached(
            (kf.fid, lvl, "spatial_gt"), compute_gt, uses=1 << 30)
        gather_mesh = None
        if mesh is not None:
            if self.shard_store:
                # capacity-sharded (FSDP-style) store: each device owns
                # capacity / D rows; the step all-gathers the render
                # working set and keeps Adam/stats sharded
                from legslam_tpu.parallel import capacity
                self.state = capacity.shard_state(self.state, mesh)
                gather_mesh = mesh
            else:
                self.state = sharded.replicate_state(self.state, mesh)
        binning = self._get_binning_spatial(kf, lvl, view, layout, cys,
                                            gather_mesh)
        return spatial.spatial_train_step(
            self.state, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, pads[0], gt_lf, pads[1], pads[2],
            self.bg, jnp.asarray(float(lr_step)),
            float(self.cameras_extent), cys,
            width=view.width, height=view.height, h_local=layout.h_local,
            active_sh_degree=self.active_sh_degree, opt=self.opt,
            cfg=self.cfg, include_lang_feat=include_lf,
            max_per_tile=self.max_per_tile, binning=binning,
            gather_mesh=gather_mesh)

    def _get_binning_spatial(self, kf, lvl: int, view, layout, cys,
                             gather_mesh=None) -> Optional[tuple]:
        """Cached per-strip binning for (kf, level), same refresh /
        invalidation policy as _get_binning."""
        if self.binning_refresh_interval <= 1:
            return None
        from legslam_tpu.parallel import spatial

        def compute():
            st = self.state
            return spatial.spatial_compute_binning(
                st.params.xyz, jnp.exp(st.params.scaling),
                st.params.rotation, st.valid, view.world_view,
                view.full_proj, view.tan_fovx, view.tan_fovy, cys,
                width=view.width, height=view.height,
                h_local=layout.h_local, cfg=self.cfg,
                max_per_tile=self.max_per_tile,
                opacity=jax.nn.sigmoid(st.params.opacity[:, 0]),
                gather_mesh=gather_mesh)

        return self._cached((kf.fid, lvl, "spatial"), compute)

    def train_iteration(self) -> Optional[float]:
        """One trainForOneIteration (gaussian_mapper.cpp:624-798)."""
        if self.state is None:
            return None
        if self.n_views > 1:
            return self._train_iteration_batched()
        kf = self._pick_keyframe()
        if kf is None:
            return None
        self.iteration += 1
        opt = self.opt
        # SH degree ramp (+1 / sh_degree_interval, gaussian_mapper.cpp:663)
        if self.iteration % opt.sh_degree_interval == 0 and \
                self.active_sh_degree < opt.sh_degree:
            self.active_sh_degree += 1

        lvl = kf.pick_pyramid_level()
        lvl = min(lvl, len(kf.views) - 1)
        view = kf.views[lvl]
        gt_color = kf.gt_color[lvl]
        gt_depth = kf.gt_depth[lvl]
        mask = kf.mask[lvl]
        gt_lf = None
        include_lf = self.include_lang_feat and kf.gt_lf is not None
        if include_lf:
            # raw grid; train_step upsamples inside the jit (one dispatch)
            gt_lf = kf.gt_lf

        # position LR step = per-KF use count clamped (gm.cpp:671-684)
        lr_step = min(kf.record.get("used", 1),
                      self.mp.position_lr_max_steps_slam)

        if self.spatial_strips > 1:
            if include_lf:  # strip path crops rows: needs full-res LF
                gt_lf = _upsample_lf_jit(gt_lf, view.height, view.width)
            t0 = time.perf_counter()
            self.state, aux = self._spatial_step(
                kf, lvl, view, gt_color, gt_lf, gt_depth, mask,
                include_lf, lr_step)
        else:
            gather_mesh = None
            if self.shard_store and self._mesh is not None and \
                    self._mesh.devices.size > 1:
                # capacity-sharded store on the 1D mesh: re-place (no-op
                # when already sharded), all-gather inside the loss
                from legslam_tpu.parallel import capacity
                self.state = capacity.shard_state(self.state, self._mesh)
                gather_mesh = self._mesh
            binning = self._get_binning(kf, lvl, view)
            emit = bool(
                self.binning_trim and self._binning_fresh
                and binning is not None
                and self.binning_refresh_interval > 1
                and self.cfg.backend == "pallas"
                and getattr(self.cfg, "n_buckets", 1) == 1)
            if emit and self.binning_trim_fresh:
                # pre-trim the refresh step at the view's previous
                # watermark (+1 extra slack chunk of headroom); every
                # (max_age+1)-th refresh re-measures untrimmed
                kent = self._kfin_cache.get((kf.fid, lvl))
                if kent is not None and kent[0] < self.trim_fresh_max_age:
                    kent[0] += 1
                    binning = (_trim_binning_jit(
                        binning[0], kent[1], max_pairs=self.cfg.max_pairs,
                        chunk=self.cfg.chunk, slack_chunks=2), binning[1])
                else:
                    self._kfin_cache.pop((kf.fid, lvl), None)
            t0 = time.perf_counter()
            self.state, aux = train_step(
                self.state, view.world_view, view.full_proj,
                view.cam_center, view.tan_fovx, view.tan_fovy, gt_color,
                gt_lf, gt_depth, mask, self.bg,
                jnp.asarray(float(lr_step)), float(self.cameras_extent),
                width=view.width, height=view.height,
                active_sh_degree=self.active_sh_degree, opt=opt,
                cfg=self.cfg, include_lang_feat=include_lf,
                max_per_tile=self.max_per_tile, binning=binning,
                emit_kfin=emit, gather_mesh=gather_mesh)
            if emit and aux.kfin is not None:
                # trim the just-cached binning at the refresh step's
                # termination watermark for the remaining reuse steps
                # (bit-exact at the measured state; ops/binning.py)
                key = (kf.fid, lvl)
                ent = self._binning_cache.get(key)
                if ent is not None:
                    trimmed = _trim_binning_jit(
                        binning[0], aux.kfin,
                        max_pairs=self.cfg.max_pairs, chunk=self.cfg.chunk)
                    self._binning_cache[key] = (ent[0],
                                                (trimmed, binning[1]))
                if self.binning_trim_fresh:
                    # age stayed incremented if this refresh was
                    # pre-trimmed; a full re-measure re-enters at age 0
                    age = self._kfin_cache.get(key, [0, None])[0]
                    self._kfin_cache[key] = [age, aux.kfin]
                    while len(self._kfin_cache) > \
                            self.binning_cache_entries:
                        self._kfin_cache.pop(
                            next(iter(self._kfin_cache)))
        # avoid a host sync every iteration (the device dispatch pipeline
        # hides transfer latency); fetch the loss only periodically
        self._last_aux = aux
        loss = None
        if self.iteration % self.loss_sync_interval == 0:
            # ONE batched fetch: separate float()/int() reads each pay a
            # full tunnel round trip on top of the queue drain (measured
            # 3 x ~120 ms per sync in the online loop)
            if aux.sync3 is not None:
                loss, dropped, rendered, nvalid = np.asarray(aux.sync3)
                self._approx_valid = int(nvalid)
            else:
                loss, dropped, rendered = (
                    np.asarray(v).item() for v in jax.device_get(
                        (aux.loss, aux.overflow_pairs, aux.num_rendered)))
            self.ema_loss = 0.6 * loss + 0.4 * self.ema_loss \
                if self.iteration > 1 else loss
            # overflow guardrail: the reference never drops pairs
            # (rasterize_points.cu:29-35 resizes its buffers to
            # num_rendered); when any static cap clips >0.1% the mapper
            # ESCALATES that cap to the next rung (one-time re-jit, like
            # the capacity ladder) and only warns once nothing is left to
            # escalate
            dropped = int(dropped)
            rendered = max(int(rendered), 1)
            if dropped > 0 and dropped / rendered > 1e-3:
                self._respond_to_overflow(dropped, rendered)
        self.timings.append(time.perf_counter() - t0)
        self._post_step_densify()
        self._maybe_grow_capacity()
        return loss

    def _respond_to_overflow(self, dropped: int, rendered: int) -> None:
        """Adaptive response to pair overflow (the reference never drops
        pairs — rasterize_points.cu:29-35 sizes every buffer to
        num_rendered; our static-shape equivalent is a cap LADDER that
        escalates on demand, one re-jit per rung, executables persisting
        in the compilation cache like the capacity ladder's).

        `rendered` is the PRE-truncation pair count, so the max_pairs
        share of the drop is host-computable without extra device
        traffic: trunc = rendered - max_pairs; the remainder was clipped
        by the static tile-span cap. max_pairs escalates to ~2x the
        observed footprint (pow2, bounded by the configured budget);
        the span cap doubles its y rows first (tile_h=16 makes span_y
        the binding axis for close-up footprints), then x, until the
        span covers the whole tile grid. Only when nothing is left to
        escalate does the old warning fire. Single-view path only (the
        batched/spatial paths pin shapes at construction)."""
        import dataclasses as _dc
        escalatable = self.n_views == 1 and self.spatial_strips == 1
        # the xla backend indexes full per-tile ranges (no max_pairs
        # truncation; its third drop source is the per-tile cap instead)
        flat_pallas = self.cfg.backend == "pallas" and \
            getattr(self.cfg, "n_buckets", 1) == 1
        trunc = max(0, rendered - self.cfg.max_pairs) if flat_pallas else 0
        span_drop = dropped - trunc
        changed = []
        if escalatable and trunc > 0:
            want = 1 << max(int(np.ceil(np.log2(max(2 * rendered, 2)))),
                            16)
            floor = min(want, self._base_max_pairs)
            if floor > self._pairs_floor:
                self._pairs_floor = floor
                if floor > self.cfg.max_pairs:
                    self.cfg = _dc.replace(self.cfg, max_pairs=floor)
                    changed.append(f"max_pairs->{floor}")
        if escalatable and span_drop / rendered > 1e-3:
            msx, msy = self.cfg.max_span_x, self.cfg.max_span_y
            nty = -(-int(self.intr["height"]) // self.cfg.tile_h)
            ntx = -(-int(self.intr["width"]) // self.cfg.tile_w)
            if msy < nty:
                self.cfg = _dc.replace(self.cfg,
                                       max_span_y=min(2 * msy, nty))
                changed.append(f"max_span_y->{self.cfg.max_span_y}")
            elif msx < ntx:
                self.cfg = _dc.replace(self.cfg,
                                       max_span_x=min(2 * msx, ntx))
                changed.append(f"max_span_x->{self.cfg.max_span_x}")
            elif not flat_pallas and self.max_per_tile < (1 << 16):
                # span already covers the grid: on the xla backend the
                # remaining clip is the per-tile cap
                self.max_per_tile = min(2 * self.max_per_tile, 1 << 16)
                changed.append(f"max_per_tile->{self.max_per_tile}")
        if changed:
            # cached binnings carry buffers shaped by the OLD caps
            self._invalidate_binning()
            self.overflow_escalations.append((self.iteration, changed))
            logging.info(
                "pair overflow (%d of %d at iter %d): escalated %s",
                dropped, rendered, self.iteration, ", ".join(changed))
        else:
            import warnings
            warnings.warn(
                f"rasterizer pair overflow: {dropped} of {rendered} "
                f"pairs dropped at iter {self.iteration} and no cap "
                "rung left to escalate — raise max_pairs/max_span/"
                "max_per_tile explicitly", RuntimeWarning)

    def _maybe_grow_capacity(self) -> None:
        if self.state is None or not self.capacity_ladder:
            return
        cap = self.state.capacity
        if cap >= self.capacity or self._approx_valid <= 0.6 * cap:
            return
        new_cap = min(cap * 4, self.capacity)
        self.state = G.grow_capacity(self.state, new_cap)
        self._ladder_cfg(new_cap)
        self._invalidate_binning()

    def _ladder_cfg(self, cap: int) -> None:
        """Scale the pair budget with the rung: a 1k-point early store
        under the full max_pairs pays a 1M-row sort per binning refresh
        for ~10k real pairs. 8 pairs/gaussian is ~3x the measured
        converged footprint (531k pairs @ 200k); overflow still warns."""
        import dataclasses as _dc
        mp = min(self._base_max_pairs,
                 max(1 << 16, 8 * cap, self._pairs_floor))
        if mp != self.cfg.max_pairs:
            self.cfg = _dc.replace(self.cfg, max_pairs=mp)

    def _post_step_densify(self) -> None:
        """Densification schedule (gaussian_mapper.cpp:737-760)."""
        opt = self.opt
        if self.iteration < opt.densify_until_iter:
            if opt.prune_big_point_after_iter and \
                    self.iteration > opt.prune_big_point_after_iter:
                self.big_points_on = True
            if self.iteration > opt.densify_from_iter and \
                    self.iteration % opt.densification_interval == 0:
                self.key, sub = jax.random.split(self.key)
                self.state = _densify_jit(
                    self.state, sub, opt.densify_grad_threshold,
                    opt.densify_min_opacity, float(self.cameras_extent),
                    opt.max_screen_size if self.big_points_on else None,
                    opt.percent_dense)
                self._invalidate_binning()
            if opt.opacity_reset_interval > 0 and \
                    self.iteration % opt.opacity_reset_interval == 0:
                self.state = _reset_opacity_jit(self.state)
                self._invalidate_binning()

    def _train_iteration_batched(self) -> Optional[float]:
        """One n_views-keyframe data-parallel tick through
        parallel/sharded.batched_train_step (the TPU-native batched form
        of the gaussian_mapper.cpp:624-798 loop: same per-view masked
        loss and per-view densify-stat accumulation; one Adam update on
        the mean-of-views gradient)."""
        from legslam_tpu.parallel import sharded
        kfs = []
        for _ in range(self.n_views):
            kf = self._pick_keyframe()
            if kf is None:
                break
            kfs.append(kf)
        if not kfs:
            return None
        n0 = len(kfs)
        while len(kfs) < self.n_views:     # pad short batches by reuse
            kfs.append(kfs[len(kfs) % n0])
        self.iteration += 1
        opt = self.opt
        if self.iteration % opt.sh_degree_interval == 0 and \
                self.active_sh_degree < opt.sh_degree:
            self.active_sh_degree += 1

        # one pyramid level per tick (uniform shapes across the batch);
        # the scheduler's pick from the first keyframe drives the batch
        lvl = kfs[0].pick_pyramid_level()
        lvl = min(lvl, min(len(kf.views) - 1 for kf in kfs))
        views = [kf.views[lvl] for kf in kfs]
        include_lf = self.include_lang_feat and \
            all(kf.gt_lf is not None for kf in kfs)
        h, w = views[0].height, views[0].width
        if include_lf:
            gt_lf = jnp.stack([_upsample_lf_jit(kf.gt_lf, h, w)
                               for kf in kfs])
        else:
            gt_lf = jnp.zeros((len(kfs), h, w, 1), jnp.float32)
        batch = sharded.ViewBatch(
            world_view=jnp.stack([v.world_view for v in views]),
            full_proj=jnp.stack([v.full_proj for v in views]),
            cam_center=jnp.stack([v.cam_center for v in views]),
            tan_fovx=jnp.asarray([v.tan_fovx for v in views], jnp.float32),
            tan_fovy=jnp.asarray([v.tan_fovy for v in views], jnp.float32),
            gt_color=jnp.stack([kf.gt_color[lvl] for kf in kfs]),
            gt_lang_feat=gt_lf,
            gt_depth=jnp.stack([kf.gt_depth[lvl] for kf in kfs]),
            mask=jnp.stack([kf.mask[lvl] for kf in kfs]))
        lr_step = min(
            max(kf.record.get("used", 1) for kf in kfs),
            self.mp.position_lr_max_steps_slam)
        is2d = self.spatial_strips > 1
        if is2d:
            from legslam_tpu.parallel import spatial as sp
            layout = sp.spatial_layout(h, self.cfg.tile_h,
                                       self.spatial_strips)
            pad = jax.vmap(lambda x: sp.pad_rows(x, layout.h_padded))
            batch = batch._replace(
                gt_color=pad(batch.gt_color),
                gt_lang_feat=pad(batch.gt_lang_feat),
                gt_depth=pad(batch.gt_depth), mask=pad(batch.mask))
            cys = sp.strip_offsets(layout)
        if self._mesh is not None and self._mesh.devices.size > 1:
            if is2d and "strip" in self._mesh.axis_names:
                from legslam_tpu.parallel import spatial as sp
                batch = sp.shard_batch_rows(batch, self._mesh)
            else:
                batch = sharded.shard_batch(batch, self._mesh)
            self.state = sharded.replicate_state(self.state, self._mesh)
        t0 = time.perf_counter()
        if is2d:
            from legslam_tpu.parallel import spatial as sp
            self.state, aux = sp.spatial_batched_train_step(
                self.state, batch, self.bg, jnp.asarray(float(lr_step)),
                float(self.cameras_extent), cys, width=w, height=h,
                h_local=layout.h_local,
                active_sh_degree=self.active_sh_degree, opt=opt,
                cfg=self.cfg, include_lang_feat=include_lf,
                max_per_tile=self.max_per_tile)
        else:
            self.state, aux = sharded.batched_train_step(
                self.state, batch, self.bg, jnp.asarray(float(lr_step)),
                float(self.cameras_extent), width=w, height=h,
                active_sh_degree=self.active_sh_degree, opt=opt,
                cfg=self.cfg, include_lang_feat=include_lf,
                max_per_tile=self.max_per_tile)
        self._last_aux = aux
        loss = None
        if self.iteration % self.loss_sync_interval == 0:
            loss = float(aux.loss)
            self.ema_loss = 0.6 * loss + 0.4 * self.ema_loss \
                if self.iteration > 1 else loss
        self.timings.append(time.perf_counter() - t0)
        self._post_step_densify()
        return loss

    def run(self, max_iterations: Optional[int] = None,
            tail_iterations: Optional[int] = None) -> None:
        """Blocking 3-phase lifecycle."""
        opt = self.opt
        # Phase 1: initial mapping
        while not self.has_met_initial_conditions():
            self.drain_operations()
            if self.source.is_shutdown() and not self.source.has_operation():
                break
            time.sleep(0.001)
        self.drain_operations(limit=10_000)
        self.initialize_map()
        # pending sparse points may still be queued
        self.train_iteration()

        # Phase 2: incremental
        limit = max_iterations or opt.iterations
        while self.iteration < limit:
            if self.source.is_shutdown() and not self.source.has_operation():
                break
            self.drain_operations()
            self.train_iteration()

        # Phase 3: tail (0.8 * densify_interval extra, gm.cpp:538-546)
        tail = tail_iterations if tail_iterations is not None else \
            int(0.8 * opt.densification_interval)
        for _ in range(tail):
            if self.iteration >= limit:
                break
            self.train_iteration()

    # ------------------------------------------------------------------
    # Rendering / persistence (renderFromPose :1543, savePly :1679)
    # ------------------------------------------------------------------
    def render_from_pose(self, R: np.ndarray, t: np.ndarray, width: int,
                         height: int, fx: Optional[float] = None,
                         fy: Optional[float] = None,
                         include_lang_feat: bool = False):
        fx = fx if fx is not None else self.intr["fx"]
        fy = fy if fy is not None else self.intr["fy"]
        view = CameraView.create(R, t, width, height, fx=fx, fy=fy)
        st = self.state
        return rasterize(
            st.params.xyz, st.sh(), st.params.lang_feat, st.opacities(),
            st.scales(), st.params.rotation, st.valid, view, self.bg,
            self.active_sh_degree, self.cfg,
            include_lang_feat=include_lang_feat,
            max_per_tile=self.max_per_tile)

    def save(self, subdir: str = "experiment") -> str:
        """Write the reference's run-output layout (SURVEY.md §3.6):
        <out>/<subdir>/ply/point_cloud/point_cloud.ply, input.ply,
        cameras.json, cfg_args."""
        base = os.path.join(self.result_dir, subdir, "ply")
        os.makedirs(os.path.join(base, "point_cloud"), exist_ok=True)
        st = self.state
        valid = np.asarray(st.valid)
        p = st.params
        ply.save_gaussian_ply(
            os.path.join(base, "point_cloud", "point_cloud.ply"),
            np.asarray(p.xyz)[valid], np.asarray(p.f_dc)[valid],
            np.asarray(p.f_rest)[valid], np.asarray(p.lang_feat)[valid],
            np.asarray(p.opacity)[valid], np.asarray(p.scaling)[valid],
            np.asarray(p.rotation)[valid])
        ply.save_point_ply(os.path.join(base, "input.ply"),
                           np.asarray(p.xyz)[valid])
        cams = []
        for fid, kf in sorted(self.keyframes.items()):
            v = kf.views[-1]
            c2w_R = kf.R.T
            center = -(kf.R.T @ kf.t)
            cams.append(dict(
                id=int(fid), img_name=f"{fid:06d}", width=v.width,
                height=v.height, position=[float(x) for x in center],
                rotation=[[float(x) for x in row] for row in c2w_R],
                fx=float(v.focal_x), fy=float(v.focal_y)))
        with open(os.path.join(base, "cameras.json"), "w") as f:
            json.dump(cams, f)
        with open(os.path.join(base, "cfg_args"), "w") as f:
            f.write("Namespace(data_device='tpu', eval=False, "
                    f"images='images', model_path='{base}', resolution=-1, "
                    "sh_degree=3, white_background=False)\n")
        return base

    def record_keyframe_metrics(self, subdir: str = "experiment") -> dict:
        """renderAndRecordAllKeyframes equivalent: per-KF PSNR/DSSIM/render
        time artifacts (gaussian_mapper.cpp:1592-1677)."""
        out_dir = os.path.join(self.result_dir, subdir)
        os.makedirs(out_dir, exist_ok=True)
        psnrs, dssims, times = [], [], []
        for fid, kf in sorted(self.keyframes.items()):
            t0 = time.perf_counter()
            out = self.render_from_pose(
                kf.R, kf.t, kf.views[-1].width, kf.views[-1].height)
            jax.block_until_ready(out.color)
            dt = (time.perf_counter() - t0) * 1e3
            gt = kf.gt_color[-1]
            psnrs.append(float(losses.psnr_gaussian_splatting(out.color, gt)))
            dssims.append(float(1.0 - losses.ssim(out.color, gt)))
            times.append(dt)
        for name, vals in (("psnr_gaussian_splatting.txt", psnrs),
                           ("dssim.txt", dssims),
                           ("render_time.txt", times)):
            with open(os.path.join(out_dir, name), "w") as f:
                f.writelines(f"{v}\n" for v in vals)
        return dict(psnr=float(np.mean(psnrs)) if psnrs else 0.0,
                    dssim=float(np.mean(dssims)) if dssims else 0.0,
                    render_ms=float(np.mean(times)) if times else 0.0)
