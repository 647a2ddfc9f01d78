"""Per-Gaussian preprocessing: projection, EWA cov2D, conic, screen radius.

Behavioral parity with cuda_rasterizer/forward.cu:
  - in_frustum near-cull at z<=0.2:            auxiliary.h:139-160
  - projection with w-guard 1e-7:              forward.cu:197-199
  - computeCov2D (EWA + viewspace clamp 1.3):  forward.cu:74-112
  - conic + eigenvalue radius ceil(3*sqrt):    forward.cu:226-232
  - ndc2Pix:                                   auxiliary.h:41-44

Everything is batched over the capacity-padded Gaussian axis; invalid /
culled gaussians are reported through the returned mask (radius stays 0),
mirroring the reference's early-return convention (forward.cu:186-244).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from legslam_tpu.config import (
    COV2D_LOWPASS,
    NEAR_CLIP,
    PROJ_W_EPS,
    RADIUS_EIG_GUARD,
    VIEW_CLAMP,
)
from legslam_tpu.utils.camera import ndc2pix
from legslam_tpu.utils.transforms import build_cov3d


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray     # [P, 2] pixel coordinates
    conic: jnp.ndarray      # [P, 3] inverse cov2d (a, b, c)
    depth: jnp.ndarray      # [P] view-space z
    radius: jnp.ndarray     # [P] int32 screen radius (0 = culled)
    mask: jnp.ndarray       # [P] bool: visible & valid


def project_points(means3d: jnp.ndarray, full_proj: jnp.ndarray,
                   width: int, height: int):
    """Project world points to pixel coords. Returns (pix[P,2], ndc_z[P], w)."""
    ones = jnp.ones_like(means3d[..., :1])
    hom = jnp.concatenate([means3d, ones], -1) @ full_proj.T
    p_w = 1.0 / (hom[..., 3] + PROJ_W_EPS)
    ndc = hom[..., :3] * p_w[..., None]
    pix = jnp.stack(
        [ndc2pix(ndc[..., 0], width), ndc2pix(ndc[..., 1], height)], -1)
    return pix, ndc[..., 2], p_w


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, focal_x: float, focal_y: float,
                  tan_fovx: float, tan_fovy: float,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """EWA splatting 2D covariance, packed [P, 3] = (xx, xy, yy).

    cov2d = J @ Rw2c @ Vrk @ Rw2c^T @ J^T with the view-space xy clamp and the
    +0.3 diagonal low-pass (forward.cu:74-112). `valid` guards divisions by a
    non-positive view z for culled points (keeps values AND grads finite; the
    guarded lanes are masked out downstream).
    """
    t = means3d @ world_view[:3, :3].T + world_view[:3, 3]
    tz = t[..., 2]
    if valid is not None:
        tz = jnp.where(valid, tz, 1.0)
    limx = VIEW_CLAMP * tan_fovx
    limy = VIEW_CLAMP * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], -1),
         jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], -1)], -2)
    T = J @ world_view[:3, :3]  # [P, 2, 3]

    xx, xy, xz, yy, yz, zz = (cov3d[..., i] for i in range(6))
    V = jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)], -2)
    cov = T @ V @ jnp.swapaxes(T, -1, -2)  # [P, 2, 2]
    return jnp.stack(
        [cov[..., 0, 0] + COV2D_LOWPASS, cov[..., 0, 1],
         cov[..., 1, 1] + COV2D_LOWPASS], -1)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               valid: jnp.ndarray, world_view: jnp.ndarray,
               full_proj: jnp.ndarray, width: int, height: int,
               focal_x: float, focal_y: float, tan_fovx: float,
               tan_fovy: float, scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None) -> Preprocessed:
    """Vectorized equivalent of preprocessCUDA (forward.cu:156-256)."""
    view_z = means3d @ world_view[2, :3] + world_view[2, 3]
    in_front = view_z > NEAR_CLIP

    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, quats, scale_modifier)
    else:
        cov3d = cov3d_precomp

    cov2d = compute_cov2d(
        means3d, cov3d, world_view, focal_x, focal_y, tan_fovx, tan_fovy,
        valid=in_front)
    cov2d = jnp.where(in_front[..., None], cov2d, 1.0)

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] ** 2
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv,
         cov2d[..., 0] * det_inv], -1)

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(RADIUS_EIG_GUARD, mid * mid - det))
    lam_max = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    pix, _, _ = project_points(means3d, full_proj, width, height)
    pix = jnp.where(in_front[..., None], pix, -1e6)

    mask = valid & in_front & det_valid & (radius_f > 0.0)
    # tile-rect cull (rect area 0) is applied downstream in binning where the
    # tile grid is known; the reference also zeroes radius there.
    radius = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)

    return Preprocessed(
        mean2d=pix, conic=conic, depth=view_z, radius=radius, mask=mask)
