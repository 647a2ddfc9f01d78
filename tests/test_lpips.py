"""LPIPS(alex) JAX port (C26 third metric): math properties with random
weights + golden parity vs the torch `lpips` package when importable."""
import numpy as np
import pytest

from legslam_tpu.models import lpips as L

H, W = 64, 96


@pytest.fixture(scope="module")
def params():
    return {k: np.asarray(v) for k, v in L.init_params(
        np.random.default_rng(3)).items()}


def test_zero_for_identical(params):
    img = np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    assert float(L.lpips(params, img, img)) == pytest.approx(0.0, abs=1e-6)


def test_symmetric_and_positive(params):
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(H, W, 3)).astype(np.float32)
    b = rng.uniform(size=(H, W, 3)).astype(np.float32)
    dab = float(L.lpips(params, a, b))
    dba = float(L.lpips(params, b, a))
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-5)


def test_monotone_with_noise(params):
    rng = np.random.default_rng(2)
    a = rng.uniform(0.2, 0.8, size=(H, W, 3)).astype(np.float32)
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    d_small = float(L.lpips(params, a, np.clip(a + 0.02 * n, 0, 1)))
    d_large = float(L.lpips(params, a, np.clip(a + 0.3 * n, 0, 1)))
    assert d_large > d_small > 0


def test_batched(params):
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    b = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    d = np.asarray(L.lpips(params, a, b))
    assert d.shape == (2,)
    d0 = float(L.lpips(params, a[0], b[0]))
    np.testing.assert_allclose(d[0], d0, rtol=1e-5)


def test_feature_shapes(params):
    """AlexNet trunk tap shapes match torchvision's feature maps for a
    224x224 input (conv strides/pools as in the reference's lpips net)."""
    import jax.numpy as jnp
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    feats = L.alex_features(params, x)
    shapes = [tuple(f.shape) for f in feats]
    assert shapes == [
        (1, 55, 55, 64), (1, 27, 27, 192), (1, 13, 13, 384),
        (1, 13, 13, 256), (1, 13, 13, 256)]


def test_golden_parity_if_lpips_available():
    torch_lpips = pytest.importorskip("lpips")
    import torch

    net = torch_lpips.LPIPS(net="alex")
    # build our params from the torch net's weights
    params = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
        [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
        [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    for i, m in enumerate(convs):
        params[f"conv{i}/w"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[f"conv{i}/b"] = m.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        params[f"lin{i}/w"] = lin.model[1].weight.detach().numpy().reshape(-1)

    rng = np.random.default_rng(5)
    a = rng.uniform(size=(H, W, 3)).astype(np.float32)
    b = rng.uniform(size=(H, W, 3)).astype(np.float32)
    ta = torch.tensor(a.transpose(2, 0, 1))[None] * 2 - 1
    tb = torch.tensor(b.transpose(2, 0, 1))[None] * 2 - 1
    ref = float(net(ta, tb).item())
    ours = float(L.lpips(params, a, b))
    assert ours == pytest.approx(ref, rel=1e-3)
