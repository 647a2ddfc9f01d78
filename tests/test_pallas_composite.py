"""Pallas compositing kernel (interpret mode on CPU) vs the XLA path."""
import jax.numpy as jnp
import numpy as np

from legslam_tpu.config import RasterizeConfig
from legslam_tpu.ops.binning import bin_gaussians
from legslam_tpu.ops.pallas.composite import composite_image_pallas
from legslam_tpu.ops.projection import preprocess
from legslam_tpu.ops.rasterize import rasterize
from legslam_tpu.utils.sh import sh_to_color
from legslam_tpu.utils.transforms import normalize_quat

from .util import random_scene, simple_view

CFG = RasterizeConfig(tile_h=16, tile_w=128, max_span_x=3, max_span_y=8,
                      chunk=64, tile_batch=4)


def test_pallas_forward_matches_xla(rng):
    scene = random_scene(rng, n=300, capacity=384)
    view = simple_view()  # 160x96
    bg = jnp.zeros(3)

    ref = rasterize(**scene, view=view, bg=bg, active_sh_degree=3, cfg=CFG,
                    max_per_tile=512)

    quats = normalize_quat(jnp.asarray(scene["quats"]))
    pre = preprocess(
        jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]), quats,
        jnp.asarray(scene["valid"]), view.world_view, view.full_proj,
        view.width, view.height, view.focal_x, view.focal_y,
        view.tan_fovx, view.tan_fovy)
    rgb = sh_to_color(3, jnp.asarray(scene["sh"]),
                      jnp.asarray(scene["means3d"]), view.cam_center)
    feats = jnp.concatenate(
        [rgb, jnp.asarray(scene["lang_feat"]), pre.depth[:, None]], axis=-1)
    binning = bin_gaussians(pre, view.width, view.height, CFG)
    img, tfin = composite_image_pallas(
        binning, pre.mean2d, pre.conic, jnp.asarray(scene["opacity"]), feats,
        view.width, view.height, CFG.tile_w, CFG.tile_h,
        max_pairs=2048, chunk=64, interpret=True)

    color = img[..., :3] + tfin[..., None] * bg[None, None]
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(img[..., -1]),
                               np.asarray(ref.depth), atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(img[..., 3:-1]),
                               np.asarray(ref.lang_feat), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(tfin), np.asarray(ref.final_t),
                               atol=3e-5, rtol=1e-3)
