"""LanguageFeaturesEncoder: per-frame RGB -> 37x37x64 language features.

TPU-native replacement for the reference's ONNX pipeline (C16:
src/language_features_encoder.cpp + src/encoder_models.cpp +
src/compressor_models.cpp): resize to 518x518, /255 + ImageNet normalize,
DINOv2 ViT-B/14-reg forward -> x_norm_patchtokens [1369, 768], per-token L2
normalization (encoder_models.cpp:109-112), PCA matmul to 64-D
(compressor_models.cpp:69-98), reshape to the 37x37 64-channel feature
image (language_features_encoder.cpp:83-89). The whole thing is ONE fused
jitted graph in bf16 on the MXU instead of two ONNX sessions.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import ENCODER_GRID, ENCODER_INPUT_SIZE, LF_CHANNELS
from legslam_tpu.models import dinov2 as D
from legslam_tpu.models import pca as PCA


class LanguageFeaturesEncoder:
    """cfg-driven encoder (the reference factory reads Encoder.Type +
    PixelwiseCompressor.Type from cfg/encoder/*.yaml; we take params
    directly)."""

    def __init__(self, dino_params: dict, pca_params: PCA.PCAParams,
                 cfg: Optional[D.DinoV2Config] = None,
                 dtype=jnp.bfloat16):
        self.cfg = cfg or D.DinoV2Config()
        self.dino_params = dino_params
        self.pca_params = pca_params
        self.dtype = dtype
        self._fn = jax.jit(functools.partial(
            _encode, cfg=self.cfg, dtype=dtype))

    def create_language_features(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """[H, W, 3] float RGB in [0,1] -> [37, 37, 64]
        (LanguageFeaturesEncoder::createLanguageFeatures contract)."""
        return self._fn(self.dino_params, self.pca_params, rgb[None])[0]

    def encode_batch(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] -> [B, 37, 37, 64]."""
        return self._fn(self.dino_params, self.pca_params, rgb)


def _encode(dino_params: dict, pca_params: PCA.PCAParams, rgb: jnp.ndarray,
            *, cfg: D.DinoV2Config, dtype) -> jnp.ndarray:
    b = rgb.shape[0]
    size = cfg.image_size
    grid = size // cfg.patch_size
    if rgb.dtype == jnp.uint8:
        # sensor-native path: ship the 4x-smaller u8 image over the host
        # link (the reference uploads 8UC3 mats too) and scale on device
        rgb = rgb.astype(jnp.float32) / 255.0
    if rgb.shape[1:3] == (size, size):
        # already at encoder geometry (host-side pre-resize: shrinking
        # BEFORE upload cuts the host link bytes ~3x at Replica frames)
        x = rgb
    else:
        x = jax.image.resize(rgb, (b, size, size, 3), method="linear")
    x = D.imagenet_normalize(x)
    feats = D.forward(dino_params, x, cfg, dtype=dtype)       # [B, G*G, 768]
    feats = feats / jnp.linalg.norm(feats, axis=-1,
                                    keepdims=True).clip(1e-12)
    lf = PCA.apply_pca(pca_params, feats)                      # [B, G*G, 64]
    return lf.reshape(b, grid, grid, -1)
