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


def build_image_embedding(dino_params: dict, pca: PCA.PCAParams,
                          rgb: jnp.ndarray, cfg=None) -> jnp.ndarray:
    """Image-as-query embedding: DINOv2 patch tokens, L2-normalized,
    averaged, PCA-compressed -> [64]. Lets images be used in place of text
    for similarity queries.

    DELIBERATE DEVIATION from the reference (eval/utils.py:113-171), which
    routes image queries through CLIP's vision tower at 224px + the
    Talk2DINO projection: no CLIP image encoder exists in this repo, and
    rendered language features live in DINOv2 space already, so querying
    with mean DINOv2 patch features compares like-with-like. Similarity
    rankings will differ from the reference's CLIP-routed variant."""
    from legslam_tpu.models import dinov2 as D
    cfg = cfg or D.DinoV2Config()
    size = cfg.image_size
    x = jax.image.resize(rgb[None], (1, size, size, 3), method="linear")
    x = D.imagenet_normalize(x)
    feats = D.forward(dino_params, x, cfg)[0]          # [G*G, 768]
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
    emb = feats.mean(axis=0)
    emb = emb / jnp.linalg.norm(emb).clip(1e-12)
    return PCA.apply_pca(pca, emb[None])[0]
