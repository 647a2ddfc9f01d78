"""Talk2DINO text branch: CLIP-text -> DINOv2-space projection -> PCA-64.

Reproduces the reference's open-vocabulary text pipeline exactly
(eval/utils.py:87-111 + eval/open_vocabulary_segmentation/models/dinotext/
dinotext.py:225-276 + model.py:303-313):

  1. 7 prompt templates per category -> CLIP tokenize,
  2. CLIP ViT-B/16 encode_text per template,
  3. mean over templates,
  4. ProjectionLayer: Linear(512->768) then [tanh -> Linear(768->768)]
     (weights: the reference's weights/vitb_mlp_infonce.pth),
  5. L2 normalize,
  6. PCA compress 768 -> 64 (same PCA as the per-frame features).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.models import clip_text as CT
from legslam_tpu.models import pca as PCA

TEMPLATES = (
    "itap of a {}.",
    "a bad photo of a {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
)


class ProjectionParams(NamedTuple):
    linear_w: jnp.ndarray    # [512, 768] (kernel, input-major)
    linear_b: jnp.ndarray    # [768]
    hidden_ws: tuple         # each [768, 768]
    hidden_bs: tuple         # each [768]


def load_projection(path: str) -> ProjectionParams:
    """Read the reference checkpoint (weights/vitb_mlp_infonce.pth layout:
    linear_layer.{weight,bias}, hidden_layers.N.{weight,bias})."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    hidden_ws, hidden_bs = [], []
    i = 0
    while f"hidden_layers.{i}.weight" in sd:
        hidden_ws.append(jnp.asarray(sd[f"hidden_layers.{i}.weight"]
                                     .numpy().T))
        hidden_bs.append(jnp.asarray(sd[f"hidden_layers.{i}.bias"].numpy()))
        i += 1
    return ProjectionParams(
        linear_w=jnp.asarray(sd["linear_layer.weight"].numpy().T),
        linear_b=jnp.asarray(sd["linear_layer.bias"].numpy()),
        hidden_ws=tuple(hidden_ws), hidden_bs=tuple(hidden_bs))


def init_projection(key: jax.Array, clip_dim: int = 512,
                    dino_dim: int = 768, hidden: int = 1) -> ProjectionParams:
    ks = jax.random.split(key, hidden + 1)
    return ProjectionParams(
        linear_w=jax.random.normal(ks[0], (clip_dim, dino_dim)) * 0.02,
        linear_b=jnp.zeros((dino_dim,)),
        hidden_ws=tuple(jax.random.normal(ks[1 + i], (dino_dim, dino_dim))
                        * 0.02 for i in range(hidden)),
        hidden_bs=tuple(jnp.zeros((dino_dim,)) for _ in range(hidden)))


def project_clip_text(proj: ProjectionParams,
                      emb: jnp.ndarray) -> jnp.ndarray:
    """model.py:303-313: linear, then per hidden layer tanh -> linear."""
    x = emb @ proj.linear_w + proj.linear_b
    for w, b in zip(proj.hidden_ws, proj.hidden_bs):
        x = jnp.tanh(x)
        x = x @ w + b
    return x


def build_text_embedding(categories: Sequence[str], clip_params: dict,
                         proj: ProjectionParams,
                         pca: Optional[PCA.PCAParams],
                         tokens: Optional[np.ndarray] = None,
                         clip_cfg: Optional[CT.ClipTextConfig] = None
                         ) -> jnp.ndarray:
    """[N_categories, 64] compressed text embeddings (eval/utils.py:87-111).
    Pass `tokens` [N, T, 77] to bypass the tokenizer (offline tests)."""
    n = len(categories)
    t = len(TEMPLATES)
    if tokens is None:
        texts = [tpl.format(c) for c in categories for tpl in TEMPLATES]
        tokens = CT.tokenize(texts)
    tokens = jnp.asarray(tokens).reshape(n * t, -1)
    emb = CT.encode_text(clip_params, tokens, clip_cfg)   # [n*t, 512]
    emb = emb.reshape(n, t, -1).mean(axis=1)              # template average
    emb = project_clip_text(proj, emb)                    # [n, 768]
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-12)
    if pca is not None:
        emb = PCA.apply_pca(pca, emb)                     # [n, 64]
    return emb


def cosine_heatmap(lf_image: jnp.ndarray, text_emb: jnp.ndarray,
                   invert: bool = True) -> jnp.ndarray:
    """Per-pixel cosine similarity between a rendered LF image [H, W, 64]
    and text embeddings [N, 64] -> [N, H, W].

    `invert=True` applies the eval-side min-max inversion
    (1 - minmax(cos)); see SURVEY.md §3.3 — the training loss ADDS cosine
    similarity, so high relevance = low raw cosine, and every consumer
    inverts (eval/find_objects.py:302-303, eval/render_object.py:93).
    """
    lf = lf_image / jnp.linalg.norm(lf_image, axis=-1,
                                    keepdims=True).clip(1e-12)
    te = text_emb / jnp.linalg.norm(text_emb, axis=-1,
                                    keepdims=True).clip(1e-12)
    sim = jnp.einsum("hwc,nc->nhw", lf, te)
    if not invert:
        return sim
    lo = sim.min(axis=(1, 2), keepdims=True)
    hi = sim.max(axis=(1, 2), keepdims=True)
    return 1.0 - (sim - lo) / jnp.maximum(hi - lo, 1e-12)


def build_image_embedding(clip_vision_params: dict,
                          proj: Optional[ProjectionParams],
                          pca: Optional[PCA.PCAParams],
                          rgb: jnp.ndarray, vision_cfg=None) -> jnp.ndarray:
    """Image-as-query embedding, the exact reference pipeline
    (eval/utils.py:113-171): 224px resize + CLIP normalization -> CLIP
    vision tower (encode_image, class-token pooled 512-D) -> the SAME
    Talk2DINO projection as text (project_clip_txt) -> L2 normalize ->
    PCA compress -> [64]. Images and text then rank against rendered LF
    through one shared embedding space."""
    from legslam_tpu.models import clip_vision as CV
    x = CV.preprocess(rgb, vision_cfg)
    emb = CV.encode_image(clip_vision_params, x, vision_cfg)   # [1, 512]
    if proj is not None:
        emb = project_clip_text(proj, emb)                     # [1, 768]
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-12)
    if pca is not None:
        emb = PCA.apply_pca(pca, emb)
    return emb[0]
