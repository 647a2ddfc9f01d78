"""Synthetic RGB-D sequence for tests, demos and benchmarks.

Generates a procedural "room" of colored gaussians, renders GT color/depth
from a circular camera path with the oracle-quality tiled renderer, and
serves frames through the BaseDataset interface. This stands in for
Replica/ScanNet when no dataset is mounted (the reference has no fixture
equivalent — SURVEY.md §4 notes it tests end-to-end only)."""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.data.datasets import BaseDataset, RGBDFrame
from legslam_tpu.ops.rasterize import rasterize, render_arrays
from legslam_tpu.utils.camera import CameraView

# GT renders go through ONE jitted executable per (shape, cfg): the eager
# rasterize() path dispatches hundreds of ops per frame, which costs ~19 ms
# each over the axon tunnel (measured 83 s/frame at 1200x680 — 2004 s of
# pre-render in a system-bench run). Static args hash by value.
_render_jit = jax.jit(
    render_arrays,
    static_argnames=("width", "height", "active_sh_degree", "cfg",
                     "include_lang_feat", "max_per_tile"))


def _look_at(eye, target, up=(0.0, -1.0, 0.0)):
    """camera-to-world with +z forward (OpenCV convention)."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


class SyntheticDataset(BaseDataset):
    depth_scale = 1.0

    def __init__(self, n_frames: int = 40, width: int = 320,
                 height: int = 192, n_gaussians: int = 6000, seed: int = 0,
                 radius: float = 2.0, revolutions: float = 0.5,
                 clutter_ratio: float = 0.5):
        rng = np.random.default_rng(seed)
        self.intrinsics = dict(width=width, height=height,
                               fx=0.8 * width, fy=0.8 * width,
                               cx=width / 2 - 0.5, cy=height / 2 - 0.5)
        # a box room: gaussians on the walls of a [-4,4]^3 cube + clutter.
        # clutter_ratio=0 gives a surface-only scene (coherent depth —
        # what visual-tracking tests need); the default half-clutter fog
        # stresses the renderer instead.
        n_wall = n_gaussians - int(n_gaussians * clutter_ratio)
        walls = rng.uniform(-4, 4, size=(n_wall, 3)).astype(np.float32)
        axis = rng.integers(0, 3, n_wall)
        sign = rng.choice([-4.0, 4.0], n_wall)
        walls[np.arange(n_wall), axis] = sign
        clutter = rng.uniform(-3, 3, size=(n_gaussians - n_wall, 3)) \
            .astype(np.float32)
        self._xyz = np.concatenate([walls, clutter])
        self._colors = rng.uniform(0.1, 0.9, size=(n_gaussians, 3)) \
            .astype(np.float32)
        self._lf = rng.normal(size=(n_gaussians, 64)).astype(np.float32)
        self._lf /= np.linalg.norm(self._lf, axis=-1, keepdims=True)
        self._scales = np.full((n_gaussians, 3), 0.12, np.float32)
        self._opacity = np.full((n_gaussians,), 0.9, np.float32)
        self._quats = np.tile(np.array([1, 0, 0, 0], np.float32),
                              (n_gaussians, 1))

        self._poses = []
        for i in range(n_frames):
            a = 2 * np.pi * i / max(n_frames, 1) * revolutions
            eye = (radius * np.cos(a), 0.3 * np.sin(2 * a),
                   radius * np.sin(a))
            self._poses.append(_look_at(eye, (0.0, 0.0, 0.0)))
        self._n = n_frames
        self._cfg = RasterizeConfig(max_span_x=4, max_span_y=8, chunk=128,
                                    tile_batch=8)
        self._cache: dict[int, RGBDFrame] = {}

    def __len__(self) -> int:
        return self._n

    def gaussian_world(self):
        """Ground-truth gaussian field (for renderer-level tests)."""
        return dict(xyz=self._xyz, colors=self._colors, lf=self._lf,
                    scales=self._scales, opacity=self._opacity,
                    quats=self._quats)

    def cache_key(self) -> str:
        """Digest of everything a frame depends on (scene + poses + cfg),
        for the on-disk preload cache."""
        h = hashlib.sha1()
        for a in (self._xyz, self._colors, self._scales, self._opacity,
                  np.asarray(self._poses, np.float32)):
            h.update(np.ascontiguousarray(a).tobytes())
        h.update(json.dumps(
            [self.intrinsics, repr(self._cfg), 2],
            sort_keys=True).encode())
        return h.hexdigest()[:16]

    def preload(self, cache_dir: str = "/tmp/legslam_gt_cache") -> None:
        """Render (or load) ALL frames into the in-memory cache, backed by
        an npz on disk. On the axon TPU a cold preload pays one remote
        compile; every later process with the same scene is a file read."""
        if len(self._cache) == self._n:
            return
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"gt_{self.cache_key()}.npz")
        if os.path.exists(path):
            z = np.load(path)
            for i in range(self._n):
                self._cache[i] = RGBDFrame(
                    index=i, timestamp=float(i), color=z["color"][i],
                    depth=z["depth"][i], c2w=self._poses[i])
            return
        frames = [self.read(i, use_jit=True) for i in range(self._n)]
        tmp = path[:-4] + f".tmp{os.getpid()}.npz"
        np.savez(tmp, color=np.stack([f.color for f in frames]),
                 depth=np.stack([f.depth for f in frames]))
        os.replace(tmp, path)

    def read(self, i: int, use_jit: bool = False) -> RGBDFrame:
        if i in self._cache:
            return self._cache[i]
        intr = self.intrinsics
        c2w = self._poses[i]
        w2c = np.linalg.inv(c2w)
        view = CameraView.create(
            w2c[:3, :3], w2c[:3, 3], intr["width"], intr["height"],
            fx=intr["fx"], fy=intr["fy"])
        from legslam_tpu.utils.sh import rgb_to_sh
        sh = np.zeros((self._xyz.shape[0], 16, 3), np.float32)
        sh[:, 0] = np.asarray(rgb_to_sh(self._colors))
        # use_jit (the preload path) renders through ONE compiled
        # executable — essential on the axon TPU, where the eager path's
        # per-op dispatches cost ~19 ms each (measured 83 s/frame at
        # 1200x680). Default stays eager: jit-vs-eager reorders float
        # ops by ~1e-6, which is below any quality bar but enough to
        # perturb corner rankings in chaos-sensitive tracking tests.
        if use_jit:
            out = _render_jit(
                jnp.asarray(self._xyz), jnp.asarray(sh),
                jnp.asarray(self._lf), jnp.asarray(self._opacity),
                jnp.asarray(self._scales), jnp.asarray(self._quats),
                jnp.ones(self._xyz.shape[0], bool), view.world_view,
                view.full_proj, view.cam_center, view.tan_fovx,
                view.tan_fovy, width=intr["width"], height=intr["height"],
                bg=jnp.zeros(3), active_sh_degree=0, cfg=self._cfg,
                max_per_tile=1024)
        else:
            out = rasterize(
                self._xyz, sh, self._lf, self._opacity, self._scales,
                self._quats, np.ones(self._xyz.shape[0], bool), view,
                jnp.zeros(3), active_sh_degree=0, cfg=self._cfg,
                max_per_tile=1024)
        # sensor-like surface depth: the raw composite is alpha-weighted
        # (sums w_i * d_i with leftover transmittance unassigned), which
        # underestimates depth on soft/background pixels; normalize by the
        # hit probability and invalidate near-misses like a real RGB-D
        # sensor reports holes
        hit = 1.0 - np.asarray(out.final_t)
        depth = np.where(hit > 0.5, np.asarray(out.depth) / np.maximum(
            hit, 1e-6), 0.0).astype(np.float32)
        frame = RGBDFrame(
            index=i, timestamp=float(i),
            color=np.clip(np.asarray(out.color), 0.0, 1.0),
            depth=depth, c2w=c2w)
        self._cache[i] = frame
        return frame
