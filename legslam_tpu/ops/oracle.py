"""Naive per-pixel reference rasterizer — the numerical oracle.

Composites every gaussian for every pixel (depth-sorted, with the same tile
membership clipping as the production tiled path) so the tiled/Pallas
implementations can be validated against it bit-for-bit-ish. Only meant for
small scenes/images in tests. Semantics mirror
cuda_rasterizer/forward.cu:261-392 (see ops/composite.py for the mapping).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import tile_rect
from legslam_tpu.ops.composite import blend_weights, gaussian_power, masked_alpha
from legslam_tpu.ops.projection import Preprocessed


class RenderOutput(NamedTuple):
    color: jnp.ndarray    # [H, W, 3]
    lang_feat: jnp.ndarray | None  # [H, W, LF] or None
    depth: jnp.ndarray    # [H, W]
    final_t: jnp.ndarray  # [H, W] final transmittance
    radii: jnp.ndarray    # [P]


def rasterize_oracle(pre: Preprocessed, rgb: jnp.ndarray,
                     opacity: jnp.ndarray, bg: jnp.ndarray,
                     width: int, height: int, cfg: RasterizeConfig,
                     lang_feat: jnp.ndarray | None = None) -> RenderOutput:
    """Rasterize with a dense [npix, P] weight matrix.

    Args:
      pre: preprocessed gaussians (projection.preprocess output).
      rgb: [P, 3] per-gaussian colors (post SH eval + clamp).
      opacity: [P] activated opacities.
      bg: [3] background color (added as C + T_final * bg; LF/depth get none,
          forward.cu:382-390).
      lang_feat: optional [P, LF] per-gaussian language features.
    """
    P = pre.mean2d.shape[0]
    ntx = -(-width // cfg.tile_w)
    nty = -(-height // cfg.tile_h)

    depth_key = jnp.where(pre.mask, pre.depth, jnp.inf)
    order = jnp.argsort(depth_key)

    mean2d = pre.mean2d[order]
    conic = pre.conic[order]
    op = opacity[order]
    rect = tile_rect(mean2d, pre.radius[order], cfg.tile_w, cfg.tile_h,
                     ntx, nty)
    span_ok = (rect.x1 - rect.x0) * (rect.y1 - rect.y0) > 0
    gmask = pre.mask[order] & span_ok

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = xs[None, :, None]                        # [1, W, 1]
    py = ys[:, None, None]                        # [H, 1, 1]

    power = gaussian_power(mean2d[None, None], conic[None, None], px, py)

    # tile membership: pixel's tile inside the gaussian's rect
    tx = (jnp.arange(width) // cfg.tile_w)[None, :, None]
    ty = (jnp.arange(height) // cfg.tile_h)[:, None, None]
    member = ((tx >= rect.x0[None, None]) & (tx < rect.x1[None, None]) &
              (ty >= rect.y0[None, None]) & (ty < rect.y1[None, None]))

    alpha = masked_alpha(power, op[None, None],
                         extra_mask=member & gmask[None, None])
    weights, _, t_final = blend_weights(alpha)     # [H, W, P], [H, W]

    color = jnp.einsum("hwp,pc->hwc", weights, rgb[order]) \
        + t_final[..., None] * bg[None, None]
    depth = weights @ jax.lax.stop_gradient(pre.depth[order])
    lf = None
    if lang_feat is not None:
        lf = jnp.einsum("hwp,pc->hwc", weights, lang_feat[order])
    return RenderOutput(color=color, lang_feat=lf, depth=depth,
                        final_t=t_final, radii=pre.radius)
