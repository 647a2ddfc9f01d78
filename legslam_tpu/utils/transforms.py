"""Quaternion / scaling / activation helpers.

Parity references:
  - build_rotation: include/general_utils.h:29-60 (wxyz quaternion, normalized)
  - build_scaling_rotation: gaussian_model computeCov3D (forward.cu:120-153)
  - inverse_sigmoid: include/general_utils.h:25
"""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize [..., 4] wxyz quaternions."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] wxyz quaternion (normalized inside) -> [..., 3, 3] rotation.

    Matches the reference layout (forward.cu:131-136 / general_utils.h:29).
    """
    q = normalize_quat(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance from activated scale + quaternion.

    Sigma = M @ M^T with M = R @ diag(s)  (forward.cu:120-153). Returns the
    symmetric upper triangle packed [..., 6] as (xx, xy, xz, yy, yz, zz).
    """
    R = quat_to_rotmat(quat)
    M = R * (scale_modifier * scale)[..., None, :]
    sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
         sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2]], -1)


def unpack_sym6(c: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] packed symmetric -> [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (c[..., i] for i in range(6))
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)], -2)
