"""bf16-MXU compositing path quality vs the exact f32 path.

The pallas kernels' matmuls (transmittance prefix, blend, backward dw/incl/
dfeat) accept bf16 inputs at native MXU rate (cfg.mm_dtype="bfloat16");
accumulation stays f32 and the transmittance prefix uses a hi/lo two-matmul
split, so the only quantization is the 2^-8 relative rounding of blend
features/weights. These tests pin that contract: transmittance is f32-exact,
outputs are within ~1e-2, and gradients keep direction (cos > 0.999).
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
    rng = np.random.default_rng(3)
    P = 640  # emission P*span must stay a multiple of the gather chunking
    xyz = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    xyz[:, 2] += 5
    return dict(
        xyz=xyz,
        sh=rng.normal(0, 0.3, (P, 16, 3)).astype(np.float32),
        lf=rng.normal(0, 0.5, (P, 64)).astype(np.float32),
        op=rng.uniform(0.2, 0.9, P).astype(np.float32),
        sc=np.exp(rng.uniform(-3.2, -2.2, (P, 3))).astype(np.float32),
        q=rng.normal(size=(P, 4)).astype(np.float32),
        valid=np.ones(P, bool),
    )


def _run(scene, mm_dtype):
    w2c = np.eye(4, dtype=np.float32)
    view = CameraView.create(w2c[:3, :3], w2c[:3, 3], W, H, fx=80.0,
                             fy=80.0)
    cfg = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=2, max_span_y=6,
                          chunk=64, backend="pallas", pallas_interpret=True,
                          max_pairs=1 << 13, mm_dtype=mm_dtype)
    bg = jnp.zeros(3)

    def loss_fn(lf, op):
        out = render_arrays(
            jnp.asarray(scene["xyz"]), jnp.asarray(scene["sh"]), lf, op,
            jnp.asarray(scene["sc"]), jnp.asarray(scene["q"]),
            jnp.asarray(scene["valid"]), view.world_view, view.full_proj,
            view.cam_center, view.tan_fovx, view.tan_fovy, W, H, bg, 3, cfg)
        loss = (jnp.sum(out.color ** 2) + jnp.sum(out.lang_feat ** 2)
                + jnp.sum(out.depth ** 2))
        return loss, out

    (loss, out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(
        jnp.asarray(scene["lf"]), jnp.asarray(scene["op"]))
    return out, grads, float(loss)


@pytest.fixture(scope="module")
def both(scene):
    return _run(scene, "float32"), _run(scene, "bfloat16")


def test_forward_close(both):
    (o32, _, _), (o16, _, _) = both
    assert np.abs(np.asarray(o16.color) - np.asarray(o32.color)).max() < 2e-2
    assert np.abs(np.asarray(o16.lang_feat)
                  - np.asarray(o32.lang_feat)).max() < 3e-2
    # hi/lo prefix split: transmittance carries no bf16 quantization —
    # only f32 summation-order noise (two-matmul accumulation vs one)
    assert np.abs(np.asarray(o16.final_t)
                  - np.asarray(o32.final_t)).max() < 1e-4


def test_grads_keep_direction(both):
    (_, g32, _), (_, g16, _) = both
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        assert cos > 0.999, cos
        assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30) < 2e-2


def test_loss_close(both):
    (_, _, l32), (_, _, l16) = both
    assert abs(l16 - l32) / abs(l32) < 1e-3
