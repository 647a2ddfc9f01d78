"""Watermark slab-skip (ops/slabs.py, RasterizeConfig.p_slabs) exactness.

The skip is only legal because of two store invariants:
  * live slots sit below a watermark (lowest-free-first allocation),
  * rows above it are invalid with zero Adam moments and zero grads.
These tests pin (a) output parity of the render/grad path with p_slabs on
vs off on a store with interior holes AND a dead tail, (b) adam/stats
parity including the fused invalid-grad zeroing, (c) the moment-zeroing
invariant itself across densify/prune surgery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import OptimizationParams, RasterizeConfig
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops.rasterize import render_arrays
from legslam_tpu.ops.slabs import prefix_map, watermark
from legslam_tpu.utils.camera import CameraView


CAP = 64
LIVE = 37          # watermark 37 < 64, covers slabs 0..2 of 4


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, size=(LIVE, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 4.0, size=LIVE).astype(np.float32)
    cols = rng.uniform(size=(LIVE, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=CAP)
    # interior holes below the watermark (pruned-style: zero moments)
    valid = np.array(st.valid)
    valid[[5, 19]] = False
    st = st.replace(valid=jnp.asarray(valid))
    # dead tail rows carry garbage params (stale pruned content) — the
    # skip must still be exact because mask/radius gate them out
    xyz = np.array(st.params.xyz)
    xyz[LIVE:] = rng.uniform(-1, 1, size=(CAP - LIVE, 3))
    xyz[LIVE:, 2] = 2.0
    st = st.replace(params=st.params.replace(xyz=jnp.asarray(xyz)))
    view = CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), 64, 32,
                             fx=40.0, fy=40.0)
    return st, view


def _render(st, view, p_slabs, with_offset=True):
    cfg = RasterizeConfig(backend="xla", tile_w=32, tile_h=16,
                          p_slabs=p_slabs)
    p = st.params

    def f(xyz, sh_dc, off):
        sh = jnp.concatenate([sh_dc, p.f_rest], axis=1)
        out = render_arrays(
            xyz, sh, p.lang_feat, jax.nn.sigmoid(p.opacity[:, 0]),
            jnp.exp(p.scaling), p.rotation, st.valid, view.world_view,
            view.full_proj, view.cam_center, view.tan_fovx, view.tan_fovy,
            view.width, view.height, jnp.zeros(3), 0, cfg,
            mean2d_offset=off if with_offset else None)
        loss = jnp.sum(out.color ** 2) + jnp.sum(out.depth) \
            + jnp.sum(out.lang_feat ** 2)
        return loss, out
    off0 = jnp.zeros((CAP, 2), jnp.float32)
    (loss, out), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                            has_aux=True)(
        p.xyz, p.f_dc, off0)
    return loss, out, grads


def test_watermark():
    v = jnp.zeros((16,), bool).at[jnp.asarray([0, 3, 9])].set(True)
    assert int(watermark(v)) == 10
    assert int(watermark(jnp.zeros((16,), bool))) == 0


def test_prefix_map_grad_zero_above_watermark():
    x = jnp.arange(16.0)

    def loss(x):
        y = prefix_map(lambda a: a * a, lambda a: jnp.zeros_like(a),
                       x, jnp.int32(6), 4)
        return jnp.sum(y)
    g = jax.grad(loss)(x)
    # covering slab ends at row 8; beyond it grads are exactly zero
    np.testing.assert_array_equal(np.asarray(g[8:]), 0.0)
    np.testing.assert_allclose(np.asarray(g[:8]), 2 * np.asarray(x[:8]))


def test_render_parity(scene):
    st, view = scene
    l0, o0, g0 = _render(st, view, 0)
    l1, o1, g1 = _render(st, view, 4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)
    for a, b in ((o1.color, o0.color), (o1.depth, o0.depth),
                 (o1.final_t, o0.final_t), (o1.lang_feat, o0.lang_feat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o1.radii[:LIVE]),
                                  np.asarray(o0.radii[:LIVE]))
    assert int(o1.num_rendered) == int(o0.num_rendered)
    # grads: identical math per row, but XLA contracts FMAs differently
    # inside the lax.map slab body than in the straight-line graph —
    # measured max 9.4e-6 relative through the cov2d cancellation chain
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-5)


def test_adam_stats_parity(scene):
    st, view = scene
    rng = np.random.default_rng(0)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
        st.params)
    lrs = dict(xyz=1e-3, f_dc=2e-3, f_rest=1e-4, lang_feat=5e-3,
               opacity=5e-2, scaling=5e-3, rotation=1e-3)
    # reference path: explicit zeroing then full-capacity adam
    gz = jax.tree.map(
        lambda g: jnp.where(st.valid[(...,) + (None,) * (g.ndim - 1)],
                            g, 0.0), grads)
    ref = G.adam_update(st, gz, lrs)
    got = G.adam_update(st, grads, lrs, n_slabs=4, zero_invalid=True)
    for a, b in zip(jax.tree.leaves((got.params, got.adam_m, got.adam_v)),
                    jax.tree.leaves((ref.params, ref.adam_m, ref.adam_v))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(got.adam_step) == int(ref.adam_step)

    mg = jnp.asarray(rng.normal(size=(CAP, 2)), jnp.float32)
    radii = jnp.asarray(
        np.where(np.asarray(st.valid), rng.integers(0, 5, CAP), 0),
        jnp.int32)
    s_ref = G.add_densification_stats(st, mg, radii)
    s_got = G.add_densification_stats(st, mg, radii, n_slabs=4)
    for a, b in zip(jax.tree.leaves(s_got.stats),
                    jax.tree.leaves(s_ref.stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_invalid_moments_stay_zero_through_surgery(scene):
    """The invariant the skip rests on: every store-surgery path leaves
    invalid rows with zero Adam moments."""
    st, _ = scene
    # give live rows nonzero moments, then prune some via min_opacity=1
    ones = jax.tree.map(lambda p: jnp.ones_like(p), st.params)
    st2 = st.replace(adam_m=ones, adam_v=ones)
    pruned = G.densify_and_prune(st2, jax.random.PRNGKey(0),
                                 grad_threshold=1e9, min_opacity=2.0,
                                 extent=1.0, max_screen_size=None,
                                 percent_dense=0.01)
    inv = ~np.asarray(pruned.valid)
    for m in jax.tree.leaves((pruned.adam_m, pruned.adam_v)):
        arr = np.asarray(m)
        assert np.all(arr[inv] == 0.0)
