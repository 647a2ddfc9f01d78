"""LPIPS(alex) in JAX — the third Replica metric (C26).

The reference scores LPIPS with the `lpips` package's AlexNet variant
(eval/replica_test.py:131-158: lpips.LPIPS(net='alex') on [-1,1] CHW
tensors). This is the same computation as a jitted JAX graph:

  scale input by the LPIPS shift/scale layer -> AlexNet features at
  relu1..relu5 -> unit-normalize channels -> squared difference ->
  learned 1x1 "lin" weights -> spatial mean -> sum over layers.

Weights are not distributable in this offline image; convert them once with
tools/convert_weights.py::convert_lpips from a `lpips` checkout
(lpips/weights/v0.1/alex.pth + torchvision alexnet) and pass the .npz.
Random-weight property tests cover the math; a golden-parity test activates
when the lpips package is importable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# torchvision AlexNet feature trunk: (out_ch, kernel, stride, padding),
# with 3x3/2 max-pools after relu1 and relu2 (taps are pre-pool)
ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)


def init_params(rng: np.random.Generator | None = None) -> dict:
    """Random-weight parameter pytree with the right shapes (testing /
    shape contract). Keys: conv{i}/{w,b} (HWIO), lin{i}/w ([C])."""
    rng = rng or np.random.default_rng(0)
    params = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(ALEX_CONVS):
        params[f"conv{i}/w"] = rng.normal(
            0, 1.0 / np.sqrt(k * k * cin), size=(k, k, cin, cout)
        ).astype(np.float32)
        params[f"conv{i}/b"] = np.zeros(cout, np.float32)
        params[f"lin{i}/w"] = rng.uniform(
            0, 1, size=(cout,)).astype(np.float32)
        cin = cout
    return params


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b[None, None, None, :]


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def alex_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """relu1..relu5 taps of the AlexNet trunk for [N, H, W, 3] input."""
    feats = []
    for i, (_, k, s, p) in enumerate(ALEX_CONVS):
        x = jax.nn.relu(_conv(x, params[f"conv{i}/w"], params[f"conv{i}/b"],
                              s, p))
        feats.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return feats


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (n + eps)


@jax.jit
def lpips(params: dict, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance for [H, W, 3] (or [N, H, W, 3]) float images in
    [0, 1]. Returns [] (or [N])."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    shift = jnp.asarray(_SHIFT, jnp.float32)
    scale = jnp.asarray(_SCALE, jnp.float32)
    # the reference feeds [-1, 1]
    x1 = ((img1 * 2.0 - 1.0) - shift) / scale
    x2 = ((img2 * 2.0 - 1.0) - shift) / scale
    total = 0.0
    for i, (f1, f2) in enumerate(zip(alex_features(params, x1),
                                     alex_features(params, x2))):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        w = params[f"lin{i}/w"]
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :],
                                         axis=-1), axis=(1, 2))
    return total[0] if squeeze else total


def load_params(npz_path: str) -> dict:
    return {k: jnp.asarray(v) for k, v in np.load(npz_path).items()}
