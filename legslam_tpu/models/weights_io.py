"""Model weight persistence + conversion entry points.

The reference ships ONNX artifacts (dinov2.onnx, pca_text_emb64_*.onnx) and
a torch checkpoint (weights/vitb_mlp_infonce.pth). We persist all model
params as flat .npz archives; `tools/convert_weights.py` converts the
reference artifacts into this layout.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_params(path: str, params: Any) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Any:
    z = np.load(path)
    return _unflatten({k: z[k] for k in z.files})


def load_encoder(weights_dir: str, dtype=jnp.bfloat16):
    """Build a LanguageFeaturesEncoder from <dir>/dinov2.npz + <dir>/pca.npz."""
    from legslam_tpu.models import pca as PCA
    from legslam_tpu.models.encoder import LanguageFeaturesEncoder

    dino = load_params(os.path.join(weights_dir, "dinov2.npz"))
    pca = PCA.load(os.path.join(weights_dir, "pca.npz"))
    return LanguageFeaturesEncoder(dino, pca, dtype=dtype)


def load_image_pipeline(weights_dir: str):
    """(clip_vision_params, projection, pca) for image-as-query
    (talk2dino.build_image_embedding; eval/utils.py:113-171 route)."""
    _, proj, pca = load_text_pipeline(weights_dir)
    vision = load_params(os.path.join(weights_dir, "clip_vision.npz"))
    return vision, proj, pca


def load_text_pipeline(weights_dir: str):
    """(clip_params, projection, pca) from a converted weights dir."""
    from legslam_tpu.models import pca as PCA
    from legslam_tpu.models import talk2dino as T2D

    clip_params = load_params(os.path.join(weights_dir, "clip_text.npz"))
    pj = load_params(os.path.join(weights_dir, "talk2dino_proj.npz"))
    proj = T2D.ProjectionParams(
        linear_w=pj["linear_w"], linear_b=pj["linear_b"],
        hidden_ws=tuple(pj["hidden_ws"]), hidden_bs=tuple(pj["hidden_bs"]))
    pca = PCA.load(os.path.join(weights_dir, "pca.npz"))
    return clip_params, proj, pca
