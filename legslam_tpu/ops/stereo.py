"""Depth reprojection, monocular depth borrow, and SGM stereo (C9).

TPU-native equivalents of src/stereo_vision.cu and the mapper's stereo
densify branch:
  - reproject_depth_pinhole (:40-61): masked depth -> camera-local 3D.
  - monocular neighborhood depth borrow (:63-139): keypoints WITHOUT depth
    take the depth of the nearest keypoint WITH depth within
    `max_pixel_dist` — the reference does an O(N^2) scan per keypoint; here
    it is one masked pairwise-distance matmul + argmin (MXU-friendly).
  - semi-global matching disparity (the reference drives OpenCV's CUDA SGM,
    gaussian_mapper.cpp:1302-1329): census transform + hamming cost volume
    + 4-path dynamic-programming aggregation as lax.scans over the image
    axes (each scan step is an [rows, D] vector op on the VPU), winner-take
    -all with parabolic subpixel refinement.
"""
from __future__ import annotations

import functools

import jax
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


# ---------------------------------------------------------------------------
# Semi-global matching (stereo densify branch, gaussian_mapper.cpp:1302-1405)
# ---------------------------------------------------------------------------

def census_transform(gray: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """[H, W] grayscale -> uint32 census bitstrings (window^2-1 bits):
    bit set where the neighbor is darker than the center. Edge-padded."""
    h, w = gray.shape
    r = window // 2
    gp = jnp.pad(gray, r, mode="edge")
    bits = jnp.zeros((h, w), jnp.uint32)
    k = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            nb = jax.lax.dynamic_slice(gp, (r + dy, r + dx), (h, w))
            bits = bits | (jnp.uint32(1) << jnp.uint32(k)) * \
                (nb < gray).astype(jnp.uint32)
            k += 1
    return bits


def _hamming_cost_volume(cl: jnp.ndarray, cr: jnp.ndarray,
                         num_disp: int) -> jnp.ndarray:
    """[H, W] census pair -> [H, W, D] uint8 matching cost
    (popcount(cl ^ cr shifted by d); out-of-image gets the max cost)."""
    h, w = cl.shape

    def cost_at(d):
        shifted = jnp.roll(cr, d, axis=1)
        c = jax.lax.population_count(cl ^ shifted).astype(jnp.uint8)
        xs = jnp.arange(w)
        return jnp.where(xs[None, :] >= d, c, jnp.uint8(24))

    return jnp.stack([cost_at(d) for d in range(num_disp)], axis=-1)


def _aggregate_dir(cost: jnp.ndarray, p1: float, p2: float,
                   reverse: bool) -> jnp.ndarray:
    """One SGM path along axis 1 of cost [N, L, D]: the classic recurrence
    L(p,d) = C + min(Lp(d), Lp(d+-1)+P1, min Lp + P2) - min Lp, scanned
    with a [N, D] carry."""
    c = cost.astype(jnp.float32)
    xs = jnp.moveaxis(c, 1, 0)                      # [L, N, D]
    if reverse:
        xs = xs[::-1]

    def step(prev, ci):
        lo = jnp.min(prev, axis=-1, keepdims=True)  # [N, 1]
        up = jnp.concatenate([prev[:, 1:], prev[:, -1:]], axis=1)
        dn = jnp.concatenate([prev[:, :1], prev[:, :-1]], axis=1)
        best = jnp.minimum(jnp.minimum(prev, lo + p2),
                           jnp.minimum(up, dn) + p1)
        out = ci + best - lo
        return out, out

    init = xs[0]
    _, outs = jax.lax.scan(step, init, xs[1:])
    outs = jnp.concatenate([init[None], outs], axis=0)
    if reverse:
        outs = outs[::-1]
    return jnp.moveaxis(outs, 0, 1)                 # [N, L, D]


@functools.partial(jax.jit, static_argnames=("num_disp", "min_disp"))
def sgm_disparity(left_gray: jnp.ndarray, right_gray: jnp.ndarray,
                  num_disp: int = 128, min_disp: int = 8,
                  p1: float = 10.0, p2: float = 120.0) -> jnp.ndarray:
    """SGM disparity for [H, W] grayscale pair; returns [H, W] float32 with
    parabolic subpixel refinement, invalid (<= min_disp or >= num_disp or
    weak) pixels set to -1 like OpenCV's out-of-range convention."""
    cl = census_transform(left_gray)
    cr = census_transform(right_gray)
    cost = _hamming_cost_volume(cl, cr, num_disp)   # [H, W, D]
    agg = (_aggregate_dir(cost, p1, p2, False) +
           _aggregate_dir(cost, p1, p2, True) +
           jnp.swapaxes(_aggregate_dir(
               jnp.swapaxes(cost, 0, 1), p1, p2, False), 0, 1) +
           jnp.swapaxes(_aggregate_dir(
               jnp.swapaxes(cost, 0, 1), p1, p2, True), 0, 1))
    d0 = jnp.argmin(agg, axis=-1)
    # parabola through (d0-1, d0, d0+1)
    dm = jnp.clip(d0 - 1, 0, num_disp - 1)
    dp = jnp.clip(d0 + 1, 0, num_disp - 1)
    cm = jnp.take_along_axis(agg, dm[..., None], -1)[..., 0]
    c0 = jnp.take_along_axis(agg, d0[..., None], -1)[..., 0]
    cp = jnp.take_along_axis(agg, dp[..., None], -1)[..., 0]
    denom = jnp.maximum(cm - 2 * c0 + cp, 1e-6)
    sub = jnp.clip(0.5 * (cm - cp) / denom, -0.5, 0.5)
    disp = d0.astype(jnp.float32) + sub
    ok = (disp > min_disp) & (disp < num_disp - 1)
    return jnp.where(ok, disp, -1.0)


def stereo_inactive_geo_densify(left_rgb: jnp.ndarray,
                                right_rgb: jnp.ndarray,
                                kp_pixels: jnp.ndarray,
                                fx: float, fy: float, cx: float, cy: float,
                                baseline: float,
                                num_disp: int = 128, min_disp: int = 8):
    """Stereo branch of increasePcdByKeyframeInactiveGeoDensify
    (gaussian_mapper.cpp:1302-1405): SGM disparity from the rectified pair,
    keep only KEYPOINT pixels whose disparity is in (min_disp, num_disp),
    back-project z = fx*b/disp, color from the left image.

    Returns ([N,3] camera-local points with z=-1 where invalid,
    [N,3] colors, [N] bool valid)."""
    to_gray = jnp.asarray([0.299, 0.587, 0.114])
    disp = sgm_disparity(left_rgb @ to_gray, right_rgb @ to_gray,
                         num_disp=num_disp, min_disp=min_disp)
    h, w = disp.shape
    xi = jnp.clip(kp_pixels[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(kp_pixels[:, 1].astype(jnp.int32), 0, h - 1)
    d = disp[yi, xi]
    ok = d > 0
    z = jnp.where(ok, fx * baseline / jnp.maximum(d, 1e-6), -1.0)
    pts = reproject_depth_pinhole(kp_pixels, z, fx, fy, cx, cy, valid=ok)
    cols = left_rgb[yi, xi]
    return pts, cols, ok
