"""Pallas custom-VJP compositing (interpret mode) vs XLA autodiff path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.rasterize import rasterize

from .util import random_scene, simple_view

CFG_X = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                        chunk=64, tile_batch=4, backend="xla")
CFG_P = dataclasses.replace(CFG_X, backend="pallas", max_pairs=2048,
                            pallas_interpret=True)


def test_pallas_backward_matches_xla(rng):
    scene = random_scene(rng, n=150, capacity=192)
    view = simple_view(width=128, height=48)
    bg = jnp.asarray([0.3, 0.1, 0.2])
    target = jnp.asarray(rng.uniform(size=(48, 128, 3)), jnp.float32)
    target_lf = jnp.asarray(rng.normal(size=(48, 128, 8)), jnp.float32)

    def loss(means, op, sc, lf, cfg):
        s = dict(scene, means3d=means, opacity=op, scales=sc, lang_feat=lf)
        out = rasterize(**s, view=view, bg=bg, active_sh_degree=3, cfg=cfg,
                        max_per_tile=256)
        return (jnp.mean(jnp.abs(out.color - target))
                + jnp.mean(out.lang_feat * target_lf)
                + 0.1 * jnp.mean(out.depth))

    args = (jnp.asarray(scene["means3d"]), jnp.asarray(scene["opacity"]),
            jnp.asarray(scene["scales"]), jnp.asarray(scene["lang_feat"]))

    lx = loss(*args, CFG_X)
    lp = loss(*args, CFG_P)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)

    gx = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, CFG_X)
    gp = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, CFG_P)
    for a, b, name in zip(gp, gx, ("means", "opacity", "scales", "lf")):
        assert np.isfinite(np.asarray(a)).all(), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-2, err_msg=name)


def test_bucketed_pallas_matches_xla(rng):
    """Bucketed binning (n_buckets=4) + pallas kernels == XLA path."""
    scene = random_scene(rng, n=256, capacity=256)
    view = simple_view(width=128, height=48)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg_b = dataclasses.replace(
        CFG_X, backend="pallas", pallas_interpret=True, n_buckets=4,
        bucket_cap=1024, chunk=64)

    out_x = rasterize(**scene, view=view, bg=bg, active_sh_degree=3,
                      cfg=CFG_X, max_per_tile=512)
    out_b = rasterize(**scene, view=view, bg=bg, active_sh_degree=3,
                      cfg=cfg_b, max_per_tile=512)
    np.testing.assert_allclose(np.asarray(out_b.color),
                               np.asarray(out_x.color), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_b.final_t),
                               np.asarray(out_x.final_t), atol=5e-5,
                               rtol=1e-3)

    target = jnp.asarray(rng.uniform(size=(48, 128, 3)), jnp.float32)

    def loss(means, cfg):
        out = rasterize(**dict(scene, means3d=means), view=view, bg=bg,
                        active_sh_degree=3, cfg=cfg, max_per_tile=512)
        return jnp.mean(jnp.abs(out.color - target)) + jnp.mean(out.depth)

    m = jnp.asarray(scene["means3d"])
    gx = jax.grad(loss)(m, CFG_X)
    gb = jax.grad(loss)(m, cfg_b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gx), atol=2e-4,
                               rtol=2e-2)
