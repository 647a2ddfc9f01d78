"""Loss parity tests vs independent numpy implementations."""
import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.ops import losses


def _np_ssim(a, b, win=11, sigma=1.5):
    """Independent SSIM: direct 2D correlation with zero padding."""
    xs = np.arange(win) - win // 2
    g = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    g /= g.sum()
    k = np.outer(g, g)

    def blur(img):
        H, W, C = img.shape
        pad = win // 2
        padded = np.zeros((H + 2 * pad, W + 2 * pad, C), img.dtype)
        padded[pad:-pad, pad:-pad] = img
        out = np.zeros_like(img)
        for i in range(H):
            for j in range(W):
                patch = padded[i:i + win, j:j + win]
                out[i, j] = np.tensordot(k, patch, axes=([0, 1], [0, 1]))
        return out

    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 ** 2
    s2 = blur(b * b) - mu2 ** 2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / \
        ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_numpy(rng):
    a = rng.uniform(size=(24, 30, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = float(_np_ssim(a, b))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_identity(rng):
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.99


def test_psnr_variants(rng):
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(
        float(losses.psnr(jnp.asarray(a), jnp.asarray(b))),
        10 * np.log10(1.0 / mse), rtol=1e-5)
    per_c = np.mean((a - b) ** 2, axis=(0, 1))
    want = np.mean(20 * np.log10(1.0 / np.sqrt(per_c)))
    np.testing.assert_allclose(
        float(losses.psnr_gaussian_splatting(jnp.asarray(a), jnp.asarray(b))),
        want, rtol=1e-5)


def test_cosine_similarity(rng):
    a = rng.normal(size=(8, 9, 64)).astype(np.float32)
    # aligned => 1, anti-aligned => -1
    np.testing.assert_allclose(
        float(losses.lf_cosine_similarity(jnp.asarray(a), jnp.asarray(2 * a))),
        1.0, atol=1e-6)
    np.testing.assert_allclose(
        float(losses.lf_cosine_similarity(jnp.asarray(a), jnp.asarray(-a))),
        -1.0, atol=1e-6)
    want = np.mean(
        np.sum(a * (a + 1), -1) /
        (np.linalg.norm(a, axis=-1) * np.linalg.norm(a + 1, axis=-1)))
    np.testing.assert_allclose(
        float(losses.lf_cosine_similarity(jnp.asarray(a), jnp.asarray(a + 1))),
        want, rtol=1e-5)


def test_masked_cosine_matches_autodiff(rng):
    """_lf_cos_masked (mask folded into the channel reductions + custom
    VJP) must equal autodiff through the materialized mask*pred form —
    value and both grads — including exact-zero rendered rows (the eps
    clamp branch) and masked-out pixels."""
    H, W, C = 12, 16, 64
    pred = rng.normal(size=(H, W, C)).astype(np.float32)
    pred[0] = 0.0                      # rendered LF is zero at init
    gt = rng.normal(size=(H, W, C)).astype(np.float32)
    mask = (rng.uniform(size=(H, W)) > 0.3).astype(np.float32)
    pred, gt, mask_j = jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)

    def ref(p, g):
        m = mask_j[..., None]
        pm = p * m
        dot = jnp.sum(pm * g, -1)
        n1 = jnp.sqrt(jnp.maximum(jnp.sum(pm * pm, -1), 1e-16))
        n2 = jnp.sqrt(jnp.maximum(jnp.sum(g * g, -1), 1e-16))
        return jnp.mean(dot / (n1 * n2))

    def new(p, g):
        return losses._lf_cos_masked(p, g, mask_j, 1e-8)

    v0, g0 = jax.value_and_grad(ref, argnums=(0, 1))(pred, gt)
    v1, g1 = jax.value_and_grad(new, argnums=(0, 1))(pred, gt)
    np.testing.assert_allclose(float(v1), float(v0), atol=1e-8)
    for a, b in zip(g1, g0):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        # grads at clamped rows are ~1/eps scale: compare relatively
        rel = np.abs(a - b) / (np.abs(b) + 1e-3 * np.abs(b).max() + 1e-30)
        assert rel.max() < 1e-4
    # masked-out pixels get zero dpred (the render side is gated)
    dp = np.asarray(g1[0])
    assert np.all(dp[np.asarray(mask_j) == 0.0] == 0.0)


def test_mapping_loss_shape(rng):
    H, W = 16, 24
    c = rng.uniform(size=(H, W, 3)).astype(np.float32)
    lf = rng.normal(size=(H, W, 64)).astype(np.float32)
    d = rng.uniform(1, 3, size=(H, W)).astype(np.float32)
    mask = np.ones((H, W), np.float32)
    loss = losses.mapping_loss(
        jnp.asarray(c), jnp.asarray(c * 0.9), jnp.asarray(lf),
        jnp.asarray(lf + 0.1), jnp.asarray(d), jnp.asarray(d * 1.1),
        jnp.asarray(mask), 0.2)
    assert np.isfinite(float(loss))
