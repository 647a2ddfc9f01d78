"""PCA 768->64 compressor: apply, fit, and ONNX weight extraction.

The reference ships the fitted PCA as a second ONNX model
(`pca_text_emb64_*.onnx`, input_feat [1369,768] -> compressed_feat
[1369,64]; src/compressor_models.cpp:32-98). Here it is a single matmul
that fuses into the DINOv2 graph: y = (x - mean) @ components^T.

Because the fitted ONNX artifacts may not be distributable, we also provide
`fit_pca` (exact eigendecomposition of the feature covariance, computed
streaming on device) so a deployment can fit its own compressor from a
feature corpus — the reference's offline step (SURVEY.md C16/C28).
"""
from __future__ import annotations

from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PCAParams(NamedTuple):
    mean: jnp.ndarray        # [D]
    components: jnp.ndarray  # [K, D] rows = principal axes


def apply_pca(params: PCAParams, feats: jnp.ndarray) -> jnp.ndarray:
    """[..., D] -> [..., K]."""
    return (feats - params.mean) @ params.components.T


def fit_pca(feature_batches: Iterable[np.ndarray], k: int = 64) -> PCAParams:
    """Streaming exact PCA: accumulate sum / outer-product moments over
    batches of [N, D] features, then eigh of the covariance."""
    total = None
    outer = None
    count = 0
    for batch in feature_batches:
        b = jnp.asarray(batch, jnp.float64) if False else \
            jnp.asarray(batch, jnp.float32)
        if total is None:
            total = jnp.zeros((b.shape[1],), jnp.float32)
            outer = jnp.zeros((b.shape[1], b.shape[1]), jnp.float32)
        total = total + jnp.sum(b, axis=0)
        outer = outer + b.T @ b
        count += b.shape[0]
    mean = total / count
    cov = outer / count - jnp.outer(mean, mean)
    w, v = jnp.linalg.eigh(cov)              # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T              # top-k rows
    return PCAParams(mean=mean, components=comps)


def from_onnx(path: str) -> PCAParams:
    """Extract (mean, components) from the reference's PCA ONNX file.

    The exported graph is Sub(input, mean) -> MatMul(weights); we pull the
    two initializers regardless of their names by shape.
    """
    import onnx  # gated: only needed when converting reference artifacts
    model = onnx.load(path)
    from onnx import numpy_helper
    inits = {i.name: numpy_helper.to_array(i)
             for i in model.graph.initializer}
    mean = None
    comp = None
    for arr in inits.values():
        a = np.asarray(arr)
        if a.ndim == 1 or (a.ndim == 2 and 1 in a.shape):
            mean = a.reshape(-1)
        elif a.ndim == 2:
            comp = a
    if mean is None or comp is None:
        raise ValueError(f"could not locate PCA tensors in {path}: "
                         f"{ {k: v.shape for k, v in inits.items()} }")
    if comp.shape[0] > comp.shape[1]:
        comp = comp.T  # ensure [K, D]
    return PCAParams(mean=jnp.asarray(mean, jnp.float32),
                     components=jnp.asarray(comp, jnp.float32))


def save(path: str, params: PCAParams) -> None:
    np.savez(path, mean=np.asarray(params.mean),
             components=np.asarray(params.components))


def load(path: str) -> PCAParams:
    z = np.load(path)
    return PCAParams(mean=jnp.asarray(z["mean"]),
                     components=jnp.asarray(z["components"]))
