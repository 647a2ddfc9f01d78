"""Spherical-harmonics color evaluation (degrees 0..3).

Behavioral parity with the reference SH path:
  - eval: cuda_rasterizer/forward.cu:31-71 (computeColorFromSH)
  - constants: cuda_rasterizer/auxiliary.h:21-38
  - RGB2SH/SH2RGB: include/sh_utils.h:133-139

`eval_sh` consumes SH coefficients laid out [..., K, 3] with K = (deg+1)^2
(DC first), evaluates the view direction (normalized gaussian-center minus
camera center), adds 0.5 and clamps at 0 — returning the clamp mask so the
backward can zero gradients exactly like the reference (forward.cu:66-70).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from legslam_tpu.config import SH_C0, SH_C1, SH_C2, SH_C3


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """(rgb - 0.5) / C0  (include/sh_utils.h:133)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """sh * C0 + 0.5  (include/sh_utils.h:137)."""
    return sh * SH_C0 + 0.5


def _sh_basis_cols(deg: int, x, y, z) -> list:
    """Columnar SH basis values b_k as [P] vectors (auxiliary.h:21-38
    constants, forward.cu:31-65 expansion order)."""
    basis = [jnp.full_like(x, SH_C0)]
    if deg > 0:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [SH_C2[0] * xy, SH_C2[1] * yz,
                      SH_C2[2] * (2.0 * zz - xx - yy), SH_C2[3] * xz,
                      SH_C2[4] * (xx - yy)]
            if deg > 2:
                basis += [
                    SH_C3[0] * y * (3.0 * xx - yy),
                    SH_C3[1] * xy * z,
                    SH_C3[2] * y * (4.0 * zz - xx - yy),
                    SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    SH_C3[4] * x * (4.0 * zz - xx - yy),
                    SH_C3[5] * z * (xx - yy),
                    SH_C3[6] * x * (xx - 3.0 * yy),
                ]
    return basis


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors for unit directions.

    Args:
      deg: active SH degree (0..3), static.
      sh: [..., K, 3] coefficients with K >= (deg+1)^2.
      dirs: [..., 3] unit view directions.

    Returns [..., 3] raw colors (before the +0.5 / clamp of the full path).

    The P-batched [P, K, 3] case runs columnar — basis values and the
    K-reduction as [P] vector ops — because [P, 3]-shaped terms put the
    3-wide channel axis in the 128-lane dimension (see ops/projection.py
    layout note; measured ~10x there).
    """
    if sh.ndim == 3 and dirs.ndim == 2:
        basis = _sh_basis_cols(deg, dirs[:, 0], dirs[:, 1], dirs[:, 2])
        chans = [sum(b * sh[:, k, c] for k, b in enumerate(basis))
                 for c in range(3)]
        return jnp.stack(chans, -1)
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - SH_C1 * y * sh[..., 1, :]
            + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3]
                    * z
                    * (2.0 * zz - 3.0 * xx - 3.0 * yy)
                    * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_color(deg: int, sh: jnp.ndarray, means: jnp.ndarray,
                campos: jnp.ndarray) -> jnp.ndarray:
    """Full reference color path: eval_sh(dir) + 0.5, clamped at 0.

    The clamp is a plain max(·, 0); under autodiff this zeroes gradients for
    clamped channels, matching the reference clamp-mask (forward.cu:66-70,
    backward.cu:52-54).
    """
    d = means - campos
    # guarded rsqrt, NOT norm().clip(): clip keeps the VALUE finite but
    # the grad chain still evaluates d(sqrt)/dx at 0 (= inf), and
    # 0-cotangent * inf = NaN — which poisons the xyz grads of PADDED
    # capacity slots (means == campos == 0) through any downstream
    # masking. maximum() routes the zero branch around the singularity,
    # so grads stay finite; values are identical down to ||d|| = 1e-12.
    n2 = jnp.sum(d * d, axis=-1, keepdims=True)
    d = d * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    rgb = eval_sh(deg, sh, d) + 0.5
    return jnp.maximum(rgb, 0.0)
