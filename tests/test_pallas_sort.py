"""Bitonic sort kernel vs numpy (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from legslam_tpu.ops.pallas import sort as S


def test_sort_keys(rng):
    n = 1 << 12
    keys = rng.integers(0, 1 << 30, n).astype(np.int32)
    out = np.asarray(S.sort_keys(jnp.asarray(keys), interpret=True))
    np.testing.assert_array_equal(out, np.sort(keys))


def test_sort_kv(rng):
    n = 1 << 11
    keys = rng.permutation(n).astype(np.int32)  # unique keys
    vals = rng.integers(0, 1 << 20, n).astype(np.int32)
    ok, ov = S.sort_kv(jnp.asarray(keys), jnp.asarray(vals), interpret=True)
    order = np.argsort(keys)
    np.testing.assert_array_equal(np.asarray(ok), keys[order])
    np.testing.assert_array_equal(np.asarray(ov), vals[order])


def test_argsort_f32(rng):
    n = 3000  # non power of two (padded internally)
    keys = rng.uniform(0.1, 100.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2
    order = np.asarray(S.argsort_f32(jnp.asarray(keys), jnp.asarray(valid),
                                     interpret=True))
    # the first sum(valid) entries must be the valid keys ascending
    nv = int(valid.sum())
    got = keys[order[:nv]]
    want = np.sort(keys[valid])
    np.testing.assert_allclose(got, want)
    assert (np.asarray(valid)[order[:nv]]).all()
