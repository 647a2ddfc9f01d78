"""PAMR — Pixel-Adaptive Mask Refinement (C22 eval-path component).

JAX port of the Talk2DINO eval refinement
(eval/open_vocabulary_segmentation/models/dinotext/pamr.py, used via
apply_pamr with 10 iterations and dilations [1, 2, 4, 8, 12, 24],
dinotext.py:278-289): masks are iteratively re-weighted by pixel affinities
computed from the image — affinity = softmax over the 8 dilated neighbors
of the negative absolute intensity difference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 8-neighborhood offsets (dy, dx)
_OFFSETS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
            (1, 1))

DEFAULT_DILATIONS = (1, 2, 4, 8, 12, 24)
DEFAULT_ITERATIONS = 10


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift [H, W, C] by (dy, dx) with edge padding."""
    h, w = x.shape[:2]
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, (pad_y, pad_x) + ((0, 0),) * (x.ndim - 2), mode="edge")
    return xp[pad_y[1]:pad_y[1] + h, pad_x[1]:pad_x[1] + w]


def _neighbors(x: jnp.ndarray, dilations) -> jnp.ndarray:
    """[H, W, C] -> [K, H, W, C] stacked dilated 8-neighborhoods."""
    outs = []
    for d in dilations:
        for dy, dx in _OFFSETS:
            outs.append(_shift(x, dy * d, dx * d))
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("iterations", "dilations"))
def pamr(image: jnp.ndarray, masks: jnp.ndarray,
         iterations: int = DEFAULT_ITERATIONS,
         dilations: tuple = DEFAULT_DILATIONS) -> jnp.ndarray:
    """Refine soft masks with pixel-adaptive affinities.

    Args:
      image: [H, W, 3] float RGB.
      masks: [H, W, N] per-class soft masks.
    Returns refined [H, W, N] masks.
    """
    # per-pixel affinity logits: -|I(p) - I(q)| averaged over channels,
    # std-normalized per pixel (the AffinityLayer of the reference)
    nb_img = _neighbors(image, dilations)               # [K, H, W, 3]
    diff = jnp.mean(jnp.abs(nb_img - image[None]), axis=-1)  # [K, H, W]
    std = jnp.std(diff, axis=0, keepdims=True) + 1e-8
    aff = jax.nn.softmax(-diff / std, axis=0)           # [K, H, W]

    def body(m, _):
        nb_m = _neighbors(m, dilations)                 # [K, H, W, N]
        m2 = jnp.sum(aff[..., None] * nb_m, axis=0)
        return m2, None

    masks, _ = jax.lax.scan(body, masks, None, length=iterations)
    return masks
