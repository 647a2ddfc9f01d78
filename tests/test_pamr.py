"""PAMR mask refinement sanity."""
import jax.numpy as jnp
import numpy as np

from legslam_tpu.models.pamr import pamr


def test_pamr_respects_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    mask = np.zeros((32, 32, 2), np.float32)
    mask[:, :14, 0] = 1.0
    mask[:, 18:, 1] = 1.0
    out = np.asarray(pamr(jnp.asarray(img), jnp.asarray(mask),
                          iterations=10, dilations=(1, 2, 4)))
    assert out[:, :16, 0].mean() > out[:, :16, 1].mean()
    assert out[:, 16:, 1].mean() > out[:, 16:, 0].mean()
    assert np.isfinite(out).all()


def test_pamr_preserves_uniform_mask():
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)) \
        .astype(np.float32)
    mask = np.ones((16, 16, 1), np.float32)
    out = np.asarray(pamr(jnp.asarray(img), jnp.asarray(mask),
                          iterations=5, dilations=(1, 2)))
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)
