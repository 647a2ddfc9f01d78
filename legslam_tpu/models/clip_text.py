"""CLIP ViT-B/16 text encoder in JAX (the Talk2DINO text branch input).

Equivalent of the reference's `clip_model.encode_text` usage
(eval/open_vocabulary_segmentation/models/dinotext/dinotext.py:246-253):
token embedding (vocab 49408, width 512, 77 context), 12 transformer layers
(8 heads, quick-GELU, causal mask, pre-LN), final LayerNorm, EOT-token
pooling, text projection 512->512. Weight converters accept both OpenAI
CLIP state dicts and HF CLIPTextModel(WithProjection) naming.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab: int = 49408
    context: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    proj_dim: int = 512
    eps: float = 1e-5


def init_params(cfg: ClipTextConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 4 + cfg.layers)

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

    return dict(
        token_embedding=jax.random.normal(
            ks[0], (cfg.vocab, cfg.width)) * 0.02,
        pos_embedding=jax.random.normal(
            ks[1], (cfg.context, cfg.width)) * 0.01,
        blocks=[block(ks[4 + i]) for i in range(cfg.layers)],
        ln_final=dict(scale=jnp.ones((cfg.width,)),
                      bias=jnp.zeros((cfg.width,))),
        text_projection=jax.random.normal(
            ks[2], (cfg.width, cfg.proj_dim)) * 0.02,
    )


def _ln(x, p, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block(x, p, cfg: ClipTextConfig, mask):
    b, n, w = x.shape
    h = cfg.heads
    hd = w // h
    y = _ln(x, p["ln1"], cfg.eps)
    qkv = y @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def sh(t):
        return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

    q, k, v = sh(q), sh(k), sh(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    logits = logits + mask
    att = jax.nn.softmax(logits, -1).astype(v.dtype)
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3)
    y = y.reshape(b, n, w) @ p["proj"]["kernel"] + p["proj"]["bias"]
    x = x + y
    y = _ln(x, p["ln2"], cfg.eps)
    y = _quick_gelu(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    y = y @ p["fc2"]["kernel"] + p["fc2"]["bias"]
    return x + y


def encode_text(params: dict, tokens: jnp.ndarray,
                cfg: Optional[ClipTextConfig] = None) -> jnp.ndarray:
    """tokens [B, 77] int32 -> [B, proj_dim] embeddings (EOT pooled +
    projected, like CLIP.encode_text)."""
    cfg = cfg or ClipTextConfig()
    x = params["token_embedding"][tokens] + params["pos_embedding"]
    n = tokens.shape[1]
    mask = jnp.where(
        jnp.tril(jnp.ones((n, n), bool)), 0.0, -jnp.inf)[None, None]
    for blk in params["blocks"]:
        x = _block(x, blk, cfg, mask)
    x = _ln(x, params["ln_final"], cfg.eps)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(tokens.shape[0]), eot]
    return pooled @ params["text_projection"]


def convert_openai(sd: dict, cfg: Optional[ClipTextConfig] = None) -> dict:
    """OpenAI CLIP full-model state dict -> text-branch pytree."""
    cfg = cfg or ClipTextConfig()

    def t(name):
        return jnp.asarray(np.asarray(sd[name], dtype=np.float32))

    blocks = []
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}."
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
        token_embedding=t("token_embedding.weight"),
        pos_embedding=t("positional_embedding"),
        blocks=blocks,
        ln_final=dict(scale=t("ln_final.weight"), bias=t("ln_final.bias")),
        text_projection=t("text_projection"),
    )


def convert_hf(sd: dict, proj: Optional[np.ndarray] = None,
               cfg: Optional[ClipTextConfig] = None) -> dict:
    """HF CLIPTextModel state dict (+ optional text_projection weight) ->
    pytree."""
    cfg = cfg or ClipTextConfig()

    def t(name):
        return jnp.asarray(np.asarray(sd[name], dtype=np.float32))

    def dense(prefix):
        return dict(kernel=t(prefix + ".weight").T, bias=t(prefix + ".bias"))

    blocks = []
    for i in range(cfg.layers):
        p = f"text_model.encoder.layers.{i}."
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
    if proj is None and "text_projection.weight" in sd:
        proj = np.asarray(sd["text_projection.weight"]).T
    if proj is None:
        proj = np.eye(cfg.width, cfg.proj_dim, dtype=np.float32)
    return dict(
        token_embedding=t("text_model.embeddings.token_embedding.weight"),
        pos_embedding=t("text_model.embeddings.position_embedding.weight"),
        blocks=blocks,
        ln_final=dict(scale=t("text_model.final_layer_norm.weight"),
                      bias=t("text_model.final_layer_norm.bias")),
        text_projection=jnp.asarray(proj, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Tokenizer: CLIP BPE via transformers (offline vocab) or simple fallback
# ---------------------------------------------------------------------------
_TOKENIZER = None


def tokenize(texts: list[str], context: int = 77) -> np.ndarray:
    """CLIP-style tokenization -> [N, 77] int32 with SOT/EOT."""
    global _TOKENIZER
    if _TOKENIZER is None:
        from transformers import CLIPTokenizerFast
        try:
            _TOKENIZER = CLIPTokenizerFast.from_pretrained(
                "openai/clip-vit-base-patch16")
        except Exception:  # offline: bundled vocab unavailable
            _TOKENIZER = "unavailable"
    if _TOKENIZER == "unavailable":
        raise RuntimeError(
            "CLIP tokenizer vocab not available offline; pass token ids "
            "directly or provide a local tokenizer path via "
            "CLIP_TOKENIZER_PATH")
    enc = _TOKENIZER(texts, padding="max_length", max_length=context,
                     truncation=True, return_tensors="np")
    return enc["input_ids"].astype(np.int32)
