"""Front-to-back alpha compositing, formulated as cumprod + matmul.

Key TPU-first design decision: the reference composites sequentially per
pixel (cuda_rasterizer/forward.cu:261-392). Front-to-back blending is an
associative recurrence, so we compute, per pixel, ALL gaussian alphas in
depth order, take an exclusive cumulative product of (1-alpha) to obtain
transmittances, and reduce contributions with a single [npix, K] x [K, C]
matmul that runs on the MXU. The reference's backward
(cuda_rasterizer/backward.cu:399-612, the accumulated-rec trick) is exactly
the reverse-mode derivative of this formulation, so plain JAX autodiff
reproduces the reference gradient contract, given:

  * straight-through gradient on the alpha<=0.99 clamp (the reference uses
    dL_dG = opacity * dL_dalpha, ignoring the clamp; backward.cu:591-597),
  * hard (non-differentiated) masks for the power>0 / alpha<1/255 skips and
    the T<1e-4 termination (forward.cu:340-357),
  * per-gaussian view depth treated as a constant (the reference accumulates
    dL_ddepths but never propagates it to means; backward.cu:573-580).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import ALPHA_MAX, ALPHA_MIN, T_TERMINATE


def gaussian_power(mean2d: jnp.ndarray, conic: jnp.ndarray,
                   px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Exponent of the 2D gaussian at pixel centers.

    mean2d [..., 2], conic [..., 3]; px/py broadcastable against the leading
    dims. power = -0.5*(a dx^2 + c dy^2) - b dx dy (forward.cu:338-341).
    """
    dx = mean2d[..., 0] - px
    dy = mean2d[..., 1] - py
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    return -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy


def masked_alpha(power: jnp.ndarray, opacity: jnp.ndarray,
                 extra_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Alpha with the reference skip rules baked in as hard zeros.

    alpha = min(0.99, opacity * exp(power)); zero when power > 0 or
    alpha < 1/255 (forward.cu:340-346). The 0.99 clamp is straight-through
    so gradients match backward.cu:591-607.
    """
    g = jnp.exp(jnp.minimum(power, 0.0))
    raw = opacity * g
    # straight-through min(0.99, raw)
    alpha = raw - jax.lax.stop_gradient(jnp.maximum(raw - ALPHA_MAX, 0.0))
    keep = (power <= 0.0) & (jax.lax.stop_gradient(alpha) >= ALPHA_MIN)
    if extra_mask is not None:
        keep = keep & extra_mask
    return jnp.where(keep, alpha, 0.0)


def blend_weights(alpha: jnp.ndarray,
                  t_all_in: jnp.ndarray | None = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-contribution blend weights along the last (depth-ordered) axis.

    Returns (weights, t_all_out, t_fin_delta):
      * weights[..., k] = alpha_k * T_k * contrib_k with T_k the exclusive
        product of (1 - alpha) scaled by the incoming transmittance, and
        contrib_k the reference termination rule "composite iff
        T_k * (1 - alpha_k) >= 1e-4" (forward.cu:347-357).
      * t_all_out: the ALL-alpha transmittance carry. This product is
        monotone, so once a pixel terminates it stays terminated across
        later chunks — the sticky `done` flag of the reference and the
        pallas kernel's log_t_all test. (Until the first termination every
        gaussian is composited, so the all-alpha and composited-only
        products coincide wherever contrib is true.)
      * t_fin_delta: this block's product over COMPOSITED gaussians only —
        multiply into a separate carry for the final T (background term),
        which the reference freezes at termination.
    """
    one_minus = 1.0 - alpha
    inclusive = jnp.cumprod(one_minus, axis=-1)
    if t_all_in is not None:
        inclusive = inclusive * t_all_in[..., None]
    exclusive = inclusive / jnp.where(one_minus > 0, one_minus, 1.0)
    contrib = jax.lax.stop_gradient(inclusive) >= T_TERMINATE
    weights = jnp.where(contrib, alpha * exclusive, 0.0)
    t_all_out = (t_all_in if t_all_in is not None else 1.0) * \
        jnp.prod(one_minus, axis=-1)
    t_steps = jnp.where(contrib, one_minus, 1.0)
    t_fin_delta = jnp.prod(t_steps, axis=-1)
    return weights, t_all_out, t_fin_delta
