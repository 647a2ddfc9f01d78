"""Opacity-aware pair culling (binning.effective_radius + corner-tile
cull): pairs that cannot clear the compositors' alpha >= ALPHA_MIN keep
mask (composite.py keep rule; forward.cu:353-357 contribution test) are
never emitted. The cull must be render-exact: culled pairs contribute
exactly zero to color/depth/LF and to every gradient, so outputs match
the uncontrolled 3-sigma binning up to chunk-regrouping float noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import ALPHA_MIN, RasterizeConfig
from legslam_tpu.ops.binning import effective_radius
from legslam_tpu.ops.rasterize import compute_binning, render_arrays

W, H = 256, 96
P = 1500


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(1.0, 6.0, P).astype(np.float32)
    # opacity spread: dead (< ALPHA_MIN), low, medium, high
    op = np.concatenate([
        np.full(P // 4, 1e-3), np.full(P // 4, 0.02),
        np.full(P // 4, 0.1), np.full(P - 3 * (P // 4), 0.9),
    ]).astype(np.float32)
    rng.shuffle(op)
    # small enough that no gaussian overflows the tile-span caps: under
    # overflow BOTH binnings drop pairs and legitimately keep different
    # tile subsets, which is not the property under test
    scales = np.exp(rng.uniform(-4.5, -2.7, (P, 3))).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    sh = np.zeros((P, 16, 3), np.float32)
    sh[:, 0] = rng.uniform(size=(P, 3))
    lf = rng.normal(size=(P, 64)).astype(np.float32)
    valid = np.ones(P, bool)
    valid[-3:] = False
    return (jnp.asarray(xyz), jnp.asarray(sh), jnp.asarray(lf),
            jnp.asarray(op), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(valid))


def _view():
    from legslam_tpu.utils.camera import CameraView
    return CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), W, H,
                             fx=120.0, fy=120.0)


def test_effective_radius_bound_is_conservative():
    """alpha just beyond r_eff is below ALPHA_MIN for random conics."""
    rng = np.random.default_rng(1)
    lam_max = rng.uniform(0.5, 200.0, 512)
    lam_min = lam_max * rng.uniform(0.05, 1.0, 512)
    op = rng.uniform(ALPHA_MIN * 1.01, 1.0, 512)
    radius = np.ceil(3.0 * np.sqrt(lam_max)).astype(np.int32)
    r_eff = np.asarray(effective_radius(jnp.asarray(radius),
                                        jnp.asarray(op)))
    d = r_eff + 1.0
    # worst case: displacement along the max-variance axis
    alpha = op * np.exp(-0.5 * d * d / lam_max)
    assert np.all(alpha[r_eff < radius] < ALPHA_MIN)
    assert np.all(r_eff <= radius)
    # dead gaussians (op <= ALPHA_MIN) cull entirely
    r0 = np.asarray(effective_radius(jnp.asarray(radius),
                                     jnp.full(512, ALPHA_MIN * 0.5)))
    assert np.all(r0 == 0)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_cull_is_render_exact(backend):
    cfg = RasterizeConfig(backend=backend, tile_h=16, tile_w=128,
                          max_span_x=4, max_span_y=4, chunk=64,
                          max_pairs=1 << 14, tile_batch=8,
                          pallas_interpret=(backend == "pallas"))
    xyz, sh, lf, op, scales, quats, valid = _scene()
    view = _view()
    bg = jnp.zeros(3)

    def binning(with_op):
        return compute_binning(
            xyz, scales, quats, valid, view.world_view, view.full_proj,
            view.tan_fovx, view.tan_fovy, width=W, height=H, cfg=cfg,
            max_per_tile=512, opacity=op if with_op else None)

    b_full = binning(False)
    b_cull = binning(True)
    assert int(b_full[1]) == 0 and int(b_cull[1]) == 0  # no overflow
    n_full = int(b_full[0].num_rendered)
    n_cull = int(b_cull[0].num_rendered)
    assert n_cull < 0.85 * n_full, (n_cull, n_full)  # cull actually bites

    def run(b, o, s):
        out = render_arrays(xyz, sh, lf, o, s, quats, valid,
                            view.world_view, view.full_proj,
                            view.cam_center, view.tan_fovx, view.tan_fovy,
                            W, H, bg, 3, cfg, binning=b, max_per_tile=512)
        return out.color, out.depth, out.lang_feat, out.final_t

    outs_f = run(b_full, op, scales)
    outs_c = run(b_cull, op, scales)
    for a, b, name in zip(outs_f, outs_c,
                          ("color", "depth", "lf", "t_final")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=name)

    # gradients agree too (culled pairs carry exactly zero gradient)
    def loss(o, s, b):
        c, d, l, _ = run(b, o, s)
        return (jnp.sum(c * c) + jnp.sum(d) * 1e-2
                + jnp.sum(jnp.abs(l)) * 1e-3)

    gf = jax.grad(loss, argnums=(0, 1))(op, scales, b_full)
    gc = jax.grad(loss, argnums=(0, 1))(op, scales, b_cull)
    # XLA composites pairs in one deterministic order -> tight tolerance
    # proves the cull drops only zero-contribution pairs. The pallas
    # backward regroups pair chunks (different pair list -> different
    # prefix groupings), whose documented noise floor vs the oracle is
    # rtol 2e-2 (test_pallas_grad.py:78); the anisotropic cull moves more
    # chunk boundaries than the circle cull, so allow 1.5x that floor
    # (exactness is already proven by the xla parametrization above).
    rtol, atol = (1e-3, 5e-4) if backend == "xla" else (3e-2, 3e-4)
    for a, b, name in zip(gf, gc, ("d_op", "d_scales")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol, err_msg=name)
