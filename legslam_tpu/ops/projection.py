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

LAYOUT NOTE (TPU): all math here runs on UNPACKED [P] column vectors, not
[P, 3]/[P, 2, 3] batched-tiny-matrix ops — a trailing dim of 2-4 lands in
the 128-wide lane dimension and wastes 125/128 VPU lanes. The columnar
form measured ~10x faster fwd+grad at 262k gaussians (same finding as the
flattened Adam in models/gaussians.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import (
    COV2D_LOWPASS,
    NEAR_CLIP,
    PROJ_W_EPS,
    RADIUS_EIG_GUARD,
    VIEW_CLAMP,
)
from legslam_tpu.utils.camera import ndc2pix


class Preprocessed(NamedTuple):
    mean2d: jnp.ndarray     # [P, 2] pixel coordinates
    conic: jnp.ndarray      # [P, 3] inverse cov2d (a, b, c)
    depth: jnp.ndarray      # [P] view-space z
    radius: jnp.ndarray     # [P] int32 screen radius (0 = culled)
    mask: jnp.ndarray       # [P] bool: visible & valid


def project_points(means3d: jnp.ndarray, full_proj: jnp.ndarray,
                   width: int, height: int):
    """Project world points to pixel coords. Returns (pix[P,2], ndc_z[P], w)."""
    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    fp = full_proj
    hx = fp[0, 0] * x + fp[0, 1] * y + fp[0, 2] * z + fp[0, 3]
    hy = fp[1, 0] * x + fp[1, 1] * y + fp[1, 2] * z + fp[1, 3]
    hz = fp[2, 0] * x + fp[2, 1] * y + fp[2, 2] * z + fp[2, 3]
    hw = fp[3, 0] * x + fp[3, 1] * y + fp[3, 2] * z + fp[3, 3]
    p_w = 1.0 / (hw + PROJ_W_EPS)
    pix = jnp.stack([ndc2pix(hx * p_w, width), ndc2pix(hy * p_w, height)],
                    -1)
    return pix, hz * p_w, p_w


def _cov3d_cols(scales: jnp.ndarray, quats: jnp.ndarray,
                scale_modifier: float):
    """Columnar Sigma = (R diag(s)) (R diag(s))^T (forward.cu:120-153).
    scales [P,3], quats [P,4] wxyz (normalized) -> 6 [P] columns
    (xx, xy, xz, yy, yz, zz)."""
    w, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    # normalize columnar (the old quat_to_rotmat normalized inside; keep
    # that contract even though render callers already normalize).
    # maximum-before-rsqrt, not sqrt().clip(): the clip form leaks NaN
    # GRADS at an exactly-zero quaternion (0-cotangent * d(sqrt)/dx|_0 =
    # 0 * inf) — same fix as utils/sh.py sh_to_color
    inv_n = jax.lax.rsqrt(
        jnp.maximum(w * w + qx * qx + qy * qy + qz * qz, 1e-24))
    w, qx, qy, qz = w * inv_n, qx * inv_n, qy * inv_n, qz * inv_n
    sx = scales[:, 0] * scale_modifier
    sy = scales[:, 1] * scale_modifier
    sz = scales[:, 2] * scale_modifier
    # rotation entries (general_utils.h:29 layout)
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - w * qz)
    r02 = 2 * (qx * qz + w * qy)
    r10 = 2 * (qx * qy + w * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - w * qx)
    r20 = 2 * (qx * qz - w * qy)
    r21 = 2 * (qy * qz + w * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    # M = R diag(s)
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    xx = m00 * m00 + m01 * m01 + m02 * m02
    xy = m00 * m10 + m01 * m11 + m02 * m12
    xz = m00 * m20 + m01 * m21 + m02 * m22
    yy = m10 * m10 + m11 * m11 + m12 * m12
    yz = m10 * m20 + m11 * m21 + m12 * m22
    zz = m20 * m20 + m21 * m21 + m22 * m22
    return xx, xy, xz, yy, yz, zz


def _cov2d_cols(x, y, z, cov6, world_view, focal_x, focal_y,
                tan_fovx, tan_fovy, in_front):
    """Columnar EWA cov2d (forward.cu:74-112). cov6 = 6 [P] columns.
    Returns (c00, c01, c11) [P] columns with the +0.3 low-pass applied."""
    wv = world_view
    tx = wv[0, 0] * x + wv[0, 1] * y + wv[0, 2] * z + wv[0, 3]
    ty = wv[1, 0] * x + wv[1, 1] * y + wv[1, 2] * z + wv[1, 3]
    tz = wv[2, 0] * x + wv[2, 1] * y + wv[2, 2] * z + wv[2, 3]
    tz = jnp.where(in_front, tz, 1.0)
    limx = VIEW_CLAMP * tan_fovx
    limy = VIEW_CLAMP * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    # T = J @ Rw2c (2x3, per-gaussian scalars x world_view row constants)
    t00 = j00 * wv[0, 0] + j02 * wv[2, 0]
    t01 = j00 * wv[0, 1] + j02 * wv[2, 1]
    t02 = j00 * wv[0, 2] + j02 * wv[2, 2]
    t10 = j11 * wv[1, 0] + j12 * wv[2, 0]
    t11 = j11 * wv[1, 1] + j12 * wv[2, 1]
    t12 = j11 * wv[1, 2] + j12 * wv[2, 2]

    xx, xy, xz, yy, yz, zz = cov6
    # V @ T^T columns (symmetric V), then T @ (V T^T)
    v0a = xx * t00 + xy * t01 + xz * t02
    v1a = xy * t00 + yy * t01 + yz * t02
    v2a = xz * t00 + yz * t01 + zz * t02
    v0b = xx * t10 + xy * t11 + xz * t12
    v1b = xy * t10 + yy * t11 + yz * t12
    v2b = xz * t10 + yz * t11 + zz * t12
    c00 = t00 * v0a + t01 * v1a + t02 * v2a + COV2D_LOWPASS
    c01 = t10 * v0a + t11 * v1a + t12 * v2a
    c11 = t10 * v0b + t11 * v1b + t12 * v2b + COV2D_LOWPASS
    return c00, c01, c11


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, focal_x: float, focal_y: float,
                  tan_fovx: float, tan_fovy: float,
                  valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """EWA splatting 2D covariance, packed [P, 3] = (xx, xy, yy).

    cov2d = J @ Rw2c @ Vrk @ Rw2c^T @ J^T with the view-space xy clamp and
    the +0.3 diagonal low-pass (forward.cu:74-112). `valid` guards divisions
    by a non-positive view z for culled points (keeps values AND grads
    finite; the guarded lanes are masked out downstream)."""
    in_front = jnp.ones(means3d.shape[0], bool) if valid is None else valid
    cov6 = tuple(cov3d[:, i] for i in range(6))
    c00, c01, c11 = _cov2d_cols(
        means3d[:, 0], means3d[:, 1], means3d[:, 2], cov6, world_view,
        focal_x, focal_y, tan_fovx, tan_fovy, in_front)
    # note: callers receive the low-pass already applied
    return jnp.stack([c00, c01, c11], -1)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               valid: jnp.ndarray, world_view: jnp.ndarray,
               full_proj: jnp.ndarray, width: int, height: int,
               focal_x: float, focal_y: float, tan_fovx: float,
               tan_fovy: float, scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None) -> Preprocessed:
    """Vectorized equivalent of preprocessCUDA (forward.cu:156-256)."""
    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    wv = world_view
    view_z = wv[2, 0] * x + wv[2, 1] * y + wv[2, 2] * z + wv[2, 3]
    in_front = view_z > NEAR_CLIP

    if cov3d_precomp is None:
        cov6 = _cov3d_cols(scales, quats, scale_modifier)
    else:
        cov6 = tuple(cov3d_precomp[:, i] for i in range(6))

    c00, c01, c11 = _cov2d_cols(x, y, z, cov6, world_view, focal_x,
                                focal_y, tan_fovx, tan_fovy, in_front)
    c00 = jnp.where(in_front, c00, 1.0)
    c01 = jnp.where(in_front, c01, 1.0)
    c11 = jnp.where(in_front, c11, 1.0)

    det = c00 * c11 - c01 * c01
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c11 * det_inv, -c01 * det_inv, c00 * det_inv], -1)

    mid = 0.5 * (c00 + c11)
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
