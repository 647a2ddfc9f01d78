"""power_mode="mxu" quality vs the exact VPU quadratic-form path.

The pallas kernels can evaluate the per-(pixel, pair) Gaussian exponent as
ONE [npix, 8] @ [8, chunk] MXU matmul over a tile-centered quadratic pixel
basis (cfg.power_mode="mxu") instead of the ~11-op per-element VPU chain.
The expansion trades exactness for VPU time: worst-case cancellation error
is ~ca * 64^2 * eps_f32 ~ 1e-3 in the exponent for the smallest
(lowpass-clamped) gaussians. These tests pin that the end-to-end effect on
rendered outputs and gradient direction stays far below mapping noise (the
same contract shape as tests/test_mm_dtype.py pins for bf16 MXU inputs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.rasterize import render_arrays
from legslam_tpu.utils.camera import CameraView

W, H = 128, 64


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    P = 640
    xyz = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    xyz[:, 2] += 5
    # include a band of very small scales: these become lowpass-clamped
    # (conic ~ 1/0.55) gaussians — the worst case for the expansion
    sc = np.exp(rng.uniform(-3.2, -2.2, (P, 3))).astype(np.float32)
    sc[:80] = np.exp(rng.uniform(-6.0, -4.5, (80, 3))).astype(np.float32)
    return dict(
        xyz=xyz,
        sh=rng.normal(0, 0.3, (P, 16, 3)).astype(np.float32),
        lf=rng.normal(0, 0.5, (P, 64)).astype(np.float32),
        op=rng.uniform(0.2, 0.9, P).astype(np.float32),
        sc=sc,
        q=rng.normal(size=(P, 4)).astype(np.float32),
        valid=np.ones(P, bool),
    )


def _run(scene, power_mode):
    w2c = np.eye(4, dtype=np.float32)
    view = CameraView.create(w2c[:3, :3], w2c[:3, 3], W, H, fx=80.0,
                             fy=80.0)
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2, max_span_y=6,
                          chunk=64, backend="pallas", pallas_interpret=True,
                          max_pairs=1 << 13, power_mode=power_mode)
    bg = jnp.zeros(3)

    def loss_fn(xyz, lf, op):
        out = render_arrays(
            xyz, jnp.asarray(scene["sh"]), lf, op,
            jnp.asarray(scene["sc"]), jnp.asarray(scene["q"]),
            jnp.asarray(scene["valid"]), view.world_view, view.full_proj,
            view.cam_center, view.tan_fovx, view.tan_fovy, W, H, bg, 3, cfg)
        loss = (jnp.sum(out.color ** 2) + jnp.sum(out.lang_feat ** 2)
                + jnp.sum(out.depth ** 2))
        return loss, out

    (loss, out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(
        jnp.asarray(scene["xyz"]), jnp.asarray(scene["lf"]),
        jnp.asarray(scene["op"]))
    return out, grads, float(loss)


@pytest.fixture(scope="module")
def vpu_run(scene):
    return _run(scene, "vpu")


@pytest.fixture(scope="module")
def both(scene, vpu_run):
    return vpu_run, _run(scene, "mxu")


@pytest.mark.smoke
@pytest.mark.parametrize("mode", ["sep", "sep3"])
def test_sep_modes_near_exact(scene, vpu_run, mode):
    """power_mode="sep"/"sep3" evaluates the SAME f32 quadratic with the
    x/y terms factored out of the [npix, chunk] plane — only float
    reassociation differs, so outputs must match the VPU chain to ~f32
    rounding (vs the mxu mode's 1e-3-class expansion error)."""
    ov, gv, lv = vpu_run
    os_, gs, ls = _run(scene, mode)
    assert np.abs(np.asarray(os_.color) - np.asarray(ov.color)).max() < 1e-4
    assert np.abs(np.asarray(os_.lang_feat)
                  - np.asarray(ov.lang_feat)).max() < 3e-4
    assert np.abs(np.asarray(os_.final_t)
                  - np.asarray(ov.final_t)).max() < 1e-4
    assert np.abs(np.asarray(os_.depth) - np.asarray(ov.depth)).max() < 1e-3
    assert abs(ls - lv) / abs(lv) < 1e-5
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gv)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30) < 1e-3


def test_forward_close(both):
    (ov, _, _), (om, _, _) = both
    assert np.abs(np.asarray(om.color) - np.asarray(ov.color)).max() < 5e-3
    assert np.abs(np.asarray(om.lang_feat)
                  - np.asarray(ov.lang_feat)).max() < 1e-2
    assert np.abs(np.asarray(om.final_t)
                  - np.asarray(ov.final_t)).max() < 5e-3
    assert np.abs(np.asarray(om.depth) - np.asarray(ov.depth)).max() < 5e-2


def test_grads_keep_direction(both):
    (_, gv, _), (_, gm, _) = both
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gv)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, cos
        assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30) < 2e-2


def test_loss_close(both):
    (_, _, lv), (_, _, lm) = both
    assert abs(lm - lv) / abs(lv) < 1e-3
