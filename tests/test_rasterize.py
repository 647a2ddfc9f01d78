"""Tiled rasterizer vs the per-pixel oracle, plus basic invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.oracle import rasterize_oracle
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.ops.rasterize import rasterize
from legslam_tpu.utils.sh import sh_to_color
from legslam_tpu.utils.transforms import normalize_quat

from .util import random_scene, simple_view

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)


def _oracle_render(scene, view, bg, deg=3, cfg=CFG):
    quats = normalize_quat(jnp.asarray(scene["quats"]))
    pre = preprocess(
        scene["means3d"], scene["scales"], quats, scene["valid"],
        view.world_view, view.full_proj, view.width, view.height,
        view.focal_x, view.focal_y, view.tan_fovx, view.tan_fovy)
    rgb = sh_to_color(deg, scene["sh"], scene["means3d"], view.cam_center)
    return rasterize_oracle(pre, rgb, scene["opacity"], bg, view.width,
                            view.height, cfg, lang_feat=scene["lang_feat"])


def test_tiled_matches_oracle(rng):
    scene = random_scene(rng, n=300, capacity=384)
    view = simple_view()
    bg = jnp.zeros(3)

    ref = _oracle_render(scene, view, bg)
    out = rasterize(**scene, view=view, bg=bg, active_sh_degree=3, cfg=CFG,
                    max_per_tile=512)

    np.testing.assert_allclose(out.color, ref.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth, ref.depth, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.lang_feat, ref.lang_feat, atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(out.final_t, ref.final_t, atol=2e-5, rtol=1e-4)


def test_background_blend(rng):
    """Empty scene renders exactly the background with T=1."""
    scene = random_scene(rng, n=0, capacity=64)
    view = simple_view(width=128, height=32)
    bg = jnp.asarray([0.2, 0.5, 0.9])
    out = rasterize(**scene, view=view, bg=bg, active_sh_degree=0, cfg=CFG,
                    max_per_tile=64)
    np.testing.assert_allclose(
        out.color, jnp.broadcast_to(bg, (32, 128, 3)), atol=1e-7)
    np.testing.assert_allclose(out.final_t, 1.0)
    np.testing.assert_allclose(out.depth, 0.0)
    assert int(out.num_rendered) == 0


def test_gradients_match_oracle(rng):
    """Autodiff grads of tiled path == oracle grads (same formulation)."""
    scene = random_scene(rng, n=120, capacity=128)
    view = simple_view(width=128, height=48)
    bg = jnp.asarray([0.1, 0.1, 0.1])
    target = jnp.asarray(rng.uniform(size=(48, 128, 3)), jnp.float32)

    def loss_tiled(means, op, sc):
        s = dict(scene, means3d=means, opacity=op, scales=sc)
        out = rasterize(**s, view=view, bg=bg, active_sh_degree=3, cfg=CFG,
                        max_per_tile=256)
        return jnp.mean(jnp.abs(out.color - target)) + jnp.mean(out.depth)

    def loss_oracle(means, op, sc):
        s = dict(scene, means3d=means, opacity=op, scales=sc)
        ref = _oracle_render(s, view, bg)
        return jnp.mean(jnp.abs(ref.color - target)) + jnp.mean(ref.depth)

    args = (jnp.asarray(scene["means3d"]), jnp.asarray(scene["opacity"]),
            jnp.asarray(scene["scales"]))
    g_tiled = jax.grad(loss_tiled, argnums=(0, 1, 2))(*args)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(*args)
    for gt, go in zip(g_tiled, g_oracle):
        assert jnp.all(jnp.isfinite(gt))
        np.testing.assert_allclose(gt, go, atol=5e-4, rtol=5e-3)


def test_depth_gradient_dead_end(rng):
    """The depth VALUE path is dead-ended (reference accumulates dL_ddepths
    but never applies it to means; backward.cu:573-580). With a single
    gaussian at depth z, the value-path term of d(sum depth)/dz is exactly
    sum(weights) = sum(depth)/z, so grad(stop) - grad(no_stop) must equal it.
    """
    z0 = 4.0
    scene = random_scene(rng, n=1, capacity=8)
    scene["means3d"][:1] = [0.0, 0.0, z0]
    scene["quats"][:1] = [1.0, 0.0, 0.0, 0.0]
    view = simple_view(width=128, height=32)
    bg = jnp.zeros(3)

    def depth_sum(means, stop):
        out = rasterize(**dict(scene, means3d=means), view=view, bg=bg,
                        active_sh_degree=0, cfg=CFG, max_per_tile=64,
                        stop_depth_grad=stop)
        return jnp.sum(out.depth)

    means = jnp.asarray(scene["means3d"])
    g_stop = jax.grad(depth_sum)(means, True)
    g_live = jax.grad(depth_sum)(means, False)
    total_w = depth_sum(means, True) / z0
    np.testing.assert_allclose(
        float(g_live[0, 2] - g_stop[0, 2]), float(total_w),
        rtol=1e-4)
    assert float(total_w) > 1.0  # the gaussian actually covers pixels


def test_mean2d_offset_grads(rng):
    """mean2d_offset receives pixel-space screen gradients (densify stats)."""
    scene = random_scene(rng, n=64, capacity=64)
    view = simple_view(width=128, height=32)
    bg = jnp.zeros(3)
    off = jnp.zeros((64, 2))

    def loss(off):
        out = rasterize(**scene, view=view, bg=bg, active_sh_degree=3,
                        cfg=CFG, max_per_tile=128, mean2d_offset=off)
        return jnp.mean(out.color ** 2)

    g = jax.grad(loss)(off)
    assert g.shape == (64, 2)
    assert jnp.any(g != 0)
    assert jnp.all(jnp.isfinite(g))
