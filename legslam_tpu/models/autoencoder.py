"""Shallow MLP autoencoder 768->64->768 (C28 legacy compressor).

The reference's earlier pipeline compressed OpenSeg features with a shallow
autoencoder instead of PCA (embeddings_encoder/pixelwise_decoder.py,
referenced by cfg/encoder/ckpts_text_scannet_20_ae_shallow.yaml). Provided
for compatibility: encode() is a drop-in alternative to PCA.apply_pca, and
`train_autoencoder` fits it from a feature corpus on-device.
"""
from __future__ import annotations

from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AEParams(NamedTuple):
    enc_w: jnp.ndarray  # [D, K]
    enc_b: jnp.ndarray  # [K]
    dec_w: jnp.ndarray  # [K, D]
    dec_b: jnp.ndarray  # [D]


def init(key: jax.Array, d: int = 768, k: int = 64) -> AEParams:
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(d)
    return AEParams(
        enc_w=jax.random.uniform(k1, (d, k), minval=-s, maxval=s),
        enc_b=jnp.zeros((k,)),
        dec_w=jax.random.uniform(k2, (k, d), minval=-s, maxval=s),
        dec_b=jnp.zeros((d,)))


def encode(params: AEParams, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params.enc_w + params.enc_b


def decode(params: AEParams, z: jnp.ndarray) -> jnp.ndarray:
    return z @ params.dec_w + params.dec_b


def train_autoencoder(feature_batches: Iterable[np.ndarray],
                      key: jax.Array, d: int = 768, k: int = 64,
                      lr: float = 1e-3, epochs: int = 5) -> AEParams:
    """MSE-reconstruction training with Adam (pixelwise_decoder semantics)."""
    import optax
    params = init(key, d, k)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return jnp.mean((decode(p, encode(p, batch)) - batch) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batches = [jnp.asarray(b, jnp.float32) for b in feature_batches]
    for _ in range(epochs):
        for b in batches:
            params, opt_state, _ = step(params, opt_state, b)
    return params
