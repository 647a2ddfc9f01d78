"""CLIP ViT-B/16 vision encoder in JAX (the image-as-query tower).

Equivalent of the reference's `clip_model.encode_image` usage
(eval/utils.py:113-171: 224px resize + CLIP normalization -> vision
transformer -> class-token pooling -> visual projection 768->512, after
which the embedding rides the SAME Talk2DINO projection + PCA as text).

Architecture (OpenAI CLIP VisionTransformer): 16x16 patch conv (no bias),
class token, learned position embeddings (197), pre-LN, 12 layers x width
768 x 12 heads with quick-GELU MLPs, ln_post on the class token, then the
visual projection. The transformer block is shared with the text tower
(clip_text._block, causal mask off).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.models.clip_text import _block, _ln

CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073],
                             np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711],
                            np.float32)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    proj_dim: int = 512
    eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def tokens(self) -> int:
        return self.grid * self.grid + 1


def init_params(cfg: ClipVisionConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 5 + cfg.layers)

    def dense(k, din, dout):
        return dict(kernel=jax.random.normal(k, (din, dout)) * 0.02,
                    bias=jnp.zeros((dout,)))

    def block(k):
        kk = jax.random.split(k, 4)
        w = cfg.width
        return dict(
            ln1=dict(scale=jnp.ones((w,)), bias=jnp.zeros((w,))),
            qkv=dense(kk[0], w, 3 * w),
            proj=dense(kk[1], w, w),
            ln2=dict(scale=jnp.ones((w,)), bias=jnp.zeros((w,))),
            fc1=dense(kk[2], w, 4 * w),
            fc2=dense(kk[3], 4 * w, w),
        )

    pd = cfg.patch * cfg.patch * 3
    return dict(
        # patch embedding as a [kh*kw*cin, width] matmul kernel (HWC-major)
        patch_kernel=jax.random.normal(ks[0], (pd, cfg.width)) * 0.02,
        class_embedding=jax.random.normal(ks[1], (cfg.width,)) * 0.02,
        pos_embedding=jax.random.normal(
            ks[2], (cfg.tokens, cfg.width)) * 0.01,
        ln_pre=dict(scale=jnp.ones((cfg.width,)),
                    bias=jnp.zeros((cfg.width,))),
        blocks=[block(ks[5 + i]) for i in range(cfg.layers)],
        ln_post=dict(scale=jnp.ones((cfg.width,)),
                     bias=jnp.zeros((cfg.width,))),
        visual_projection=jax.random.normal(
            ks[3], (cfg.width, cfg.proj_dim)) * 0.02,
    )


def preprocess(rgb: jnp.ndarray, cfg: Optional[ClipVisionConfig] = None
               ) -> jnp.ndarray:
    """[H, W, 3] float in [0,1] -> [1, S, S, 3] CLIP-normalized
    (eval/utils.py:132-138: Resize(224) + Normalize(mean, std))."""
    cfg = cfg or ClipVisionConfig()
    s = cfg.image_size
    x = jax.image.resize(rgb[None], (1, s, s, 3), method="linear")
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def encode_image(params: dict, images: jnp.ndarray,
                 cfg: Optional[ClipVisionConfig] = None) -> jnp.ndarray:
    """images [B, S, S, 3] (already CLIP-normalized, channel-last) ->
    [B, proj_dim] embeddings (class-token pooled + projected, like
    CLIP.encode_image)."""
    cfg = cfg or ClipVisionConfig()
    b = images.shape[0]
    g, p, w = cfg.grid, cfg.patch, cfg.width
    # patch extraction as one reshape/transpose + matmul (MXU-friendly:
    # [B*G*G, p*p*3] @ [p*p*3, width] instead of a stride-16 conv)
    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, g * g, p * p * 3) @ params["patch_kernel"]
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, w))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embedding"]
    x = _ln(x, params["ln_pre"], cfg.eps)
    mask = jnp.zeros((1, 1, cfg.tokens, cfg.tokens), jnp.float32)
    for blk in params["blocks"]:
        x = _block(x, blk, cfg, mask)
    pooled = _ln(x[:, 0], params["ln_post"], cfg.eps)
    return pooled @ params["visual_projection"]


def _conv_to_kernel(wconv: np.ndarray) -> jnp.ndarray:
    """torch Conv2d weight [width, 3, p, p] -> [p*p*3, width] matmul
    kernel matching the HWC patch flattening in encode_image."""
    w = np.asarray(wconv, np.float32)
    width = w.shape[0]
    return jnp.asarray(w.transpose(2, 3, 1, 0).reshape(-1, width))


def convert_openai(sd: dict, cfg: Optional[ClipVisionConfig] = None) -> dict:
    """OpenAI CLIP full-model state dict -> vision-branch pytree."""
    cfg = cfg or ClipVisionConfig()

    def t(name):
        return jnp.asarray(np.asarray(sd[name], dtype=np.float32))

    blocks = []
    for i in range(cfg.layers):
        p = f"visual.transformer.resblocks.{i}."
        blocks.append(dict(
            ln1=dict(scale=t(p + "ln_1.weight"), bias=t(p + "ln_1.bias")),
            qkv=dict(kernel=t(p + "attn.in_proj_weight").T,
                     bias=t(p + "attn.in_proj_bias")),
            proj=dict(kernel=t(p + "attn.out_proj.weight").T,
                      bias=t(p + "attn.out_proj.bias")),
            ln2=dict(scale=t(p + "ln_2.weight"), bias=t(p + "ln_2.bias")),
            fc1=dict(kernel=t(p + "mlp.c_fc.weight").T,
                     bias=t(p + "mlp.c_fc.bias")),
            fc2=dict(kernel=t(p + "mlp.c_proj.weight").T,
                     bias=t(p + "mlp.c_proj.bias")),
        ))
    return dict(
        patch_kernel=_conv_to_kernel(np.asarray(sd["visual.conv1.weight"])),
        class_embedding=t("visual.class_embedding"),
        pos_embedding=t("visual.positional_embedding"),
        ln_pre=dict(scale=t("visual.ln_pre.weight"),
                    bias=t("visual.ln_pre.bias")),
        blocks=blocks,
        ln_post=dict(scale=t("visual.ln_post.weight"),
                     bias=t("visual.ln_post.bias")),
        visual_projection=t("visual.proj"),
    )


def convert_hf(sd: dict, proj: Optional[np.ndarray] = None,
               cfg: Optional[ClipVisionConfig] = None) -> dict:
    """HF CLIPVisionModel(WithProjection) state dict -> pytree."""
    cfg = cfg or ClipVisionConfig()

    def t(name):
        return jnp.asarray(np.asarray(sd[name], dtype=np.float32))

    def dense(prefix):
        return dict(kernel=t(prefix + ".weight").T,
                    bias=t(prefix + ".bias"))

    blocks = []
    for i in range(cfg.layers):
        p = f"vision_model.encoder.layers.{i}."
        q = dense(p + "self_attn.q_proj")
        k = dense(p + "self_attn.k_proj")
        v = dense(p + "self_attn.v_proj")
        blocks.append(dict(
            ln1=dict(scale=t(p + "layer_norm1.weight"),
                     bias=t(p + "layer_norm1.bias")),
            qkv=dict(kernel=jnp.concatenate(
                [q["kernel"], k["kernel"], v["kernel"]], 1),
                bias=jnp.concatenate([q["bias"], k["bias"], v["bias"]])),
            proj=dense(p + "self_attn.out_proj"),
            ln2=dict(scale=t(p + "layer_norm2.weight"),
                     bias=t(p + "layer_norm2.bias")),
            fc1=dense(p + "mlp.fc1"),
            fc2=dense(p + "mlp.fc2"),
        ))
    if proj is None and "visual_projection.weight" in sd:
        proj = np.asarray(sd["visual_projection.weight"]).T
    if proj is None:
        proj = np.eye(cfg.width, cfg.proj_dim, dtype=np.float32)
    return dict(
        patch_kernel=_conv_to_kernel(np.asarray(
            sd["vision_model.embeddings.patch_embedding.weight"])),
        class_embedding=t("vision_model.embeddings.class_embedding"),
        pos_embedding=t(
            "vision_model.embeddings.position_embedding.weight"),
        ln_pre=dict(scale=t("vision_model.pre_layrnorm.weight"),
                    bias=t("vision_model.pre_layrnorm.bias")),
        blocks=blocks,
        ln_post=dict(scale=t("vision_model.post_layernorm.weight"),
                     bias=t("vision_model.post_layernorm.bias")),
        visual_projection=jnp.asarray(proj, jnp.float32),
    )
