"""Depth reprojection + monocular neighborhood densification (C9).

TPU-native equivalents of src/stereo_vision.cu:
  - reproject_depth_pinhole (:40-61): masked depth -> camera-local 3D.
  - monocular neighborhood depth borrow (:63-139): keypoints WITHOUT depth
    take the depth of the nearest keypoint WITH depth within
    `max_pixel_dist` — the reference does an O(N^2) scan per keypoint; here
    it is one masked pairwise-distance matmul + argmin (MXU-friendly).
"""
from __future__ import annotations

import jax.numpy as jnp


def reproject_depth_pinhole(pixels: jnp.ndarray, depths: jnp.ndarray,
                            fx: float, fy: float, cx: float, cy: float,
                            valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """[N,2] pixels + [N] depths -> [N,3] camera-local points; invalid
    entries get z = -1 (the reference's no-point convention)."""
    if valid is None:
        valid = depths > 0
    x = (pixels[:, 0] - cx) / fx * depths
    y = (pixels[:, 1] - cy) / fy * depths
    pts = jnp.stack([x, y, depths], -1)
    return jnp.where(valid[:, None], pts,
                     jnp.asarray([-1.0, -1.0, -1.0]))


def mono_borrow_depth(pixels: jnp.ndarray, depths: jnp.ndarray,
                      has_depth: jnp.ndarray, max_pixel_dist: float,
                      fx: float, fy: float, cx: float, cy: float):
    """Monocular inactive-geometry densify: for each keypoint without depth,
    borrow the nearest (pixel-space) keypoint's depth within
    max_pixel_dist and reproject (stereo_vision.cu:63-139).

    Returns ([N,3] camera points with z=-1 where nothing was borrowed,
    [N] bool borrowed-mask).
    """
    d2 = jnp.sum((pixels[:, None, :] - pixels[None, :, :]) ** 2, -1)
    d2 = jnp.where(has_depth[None, :], d2, jnp.inf)
    # a keypoint never borrows from itself (diagonal) — the reference scans
    # other keypoints only
    d2 = d2 + jnp.where(jnp.eye(pixels.shape[0], dtype=bool), jnp.inf, 0.0)
    nearest = jnp.argmin(d2, axis=1)
    near_d2 = jnp.min(d2, axis=1)
    ok = (~has_depth) & (near_d2 <= max_pixel_dist ** 2) & \
        jnp.isfinite(near_d2)
    borrowed = depths[nearest]
    pts = reproject_depth_pinhole(pixels, borrowed, fx, fy, cx, cy,
                                  valid=ok)
    return pts, ok
