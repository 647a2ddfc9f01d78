"""A/B the binning pipeline's ellipse cull cost/benefit on device.

Times compute_binning at bench shapes (median, pipelined dispatch) with
ellipse_cull off/on, plus the resulting step_cached time, so the cull's
net effect per refresh group can be computed:
  net per-step delta = (binning_on - binning_off)/refresh
                       + (step_on - step_off).
Usage: python tools/bench_binning_ab.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legslam_tpu.utils.runtime import enable_compilation_cache


def timed(fn, sync, iters=6, depth=8):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(depth):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) / depth)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    enable_compilation_cache()
    from legslam_tpu.config import OptimizationParams, RasterizeConfig
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.ops.rasterize import compute_binning
    from legslam_tpu.utils.camera import CameraView

    width, height, n_points, capacity = 1200, 680, 200_000, 1 << 18
    aniso = float(os.environ.get("AB_ANISO", "0"))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=capacity)
    if aniso > 0:  # stretch one axis like post-split stores
        ax = rng.integers(0, 3, size=capacity)
        stretch = rng.uniform(1.0, aniso, size=capacity).astype(np.float32)
        sc = np.array(st.params.scaling)
        sc[np.arange(capacity), ax] += np.log(stretch)
        st = st.replace(params=st.params.replace(scaling=jnp.asarray(sc)))
    from bench import steady_state_scale_clamp
    st = steady_state_scale_clamp(st, pts, fx=600.0)
    view = CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), width, height,
                             fx=600.0, fy=600.0)
    gt_color = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(height, width, 64)), jnp.float32)
    gt_depth = jnp.asarray(rng.uniform(0.5, 8.0, size=(height, width)),
                           jnp.float32)
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)
    opt = OptimizationParams()

    out = {}
    for ellipse in (False, True):
        cfg = RasterizeConfig(
            tile_h=16, tile_w=128, max_span_x=4, max_span_y=8, chunk=256,
            tile_batch=16, backend="pallas", max_pairs=1 << 20,
            mm_dtype="bfloat16", ellipse_cull=ellipse)
        binning_jit = jax.jit(
            compute_binning,
            static_argnames=("width", "height", "cfg", "max_per_tile"))

        def make_binning():
            return binning_jit(
                st.params.xyz, jnp.exp(st.params.scaling),
                st.params.rotation, st.valid, view.world_view,
                view.full_proj, view.tan_fovx, view.tan_fovy, width=width,
                height=height, cfg=cfg, max_per_tile=2048,
                opacity=jax.nn.sigmoid(st.params.opacity[:, 0]))

        b = make_binning()
        jax.block_until_ready(b[0].pair_gid)
        npairs = int(b[0].num_rendered)

        def step(s, binning):
            return train_step(
                s, view.world_view, view.full_proj, view.cam_center,
                view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth,
                mask, bg, jnp.asarray(1.0), 1.0, width=width,
                height=height, active_sh_degree=3, opt=opt, cfg=cfg,
                max_per_tile=2048, binning=binning)

        s2, aux = step(st, b)
        float(aux.loss)
        t_bin = timed(make_binning, lambda o: float(o[0].num_rendered))
        t_step = timed(lambda: step(st, b)[1], lambda o: float(o.loss))
        out[f"ellipse_{ellipse}"] = {
            "binning_ms": round(t_bin, 1), "step_cached_ms": round(t_step, 1),
            "pairs": npairs}
    for refresh in (4, 8):
        d_bin = out["ellipse_True"]["binning_ms"] - \
            out["ellipse_False"]["binning_ms"]
        d_step = out["ellipse_True"]["step_cached_ms"] - \
            out["ellipse_False"]["step_cached_ms"]
        out[f"net_per_step_ms_refresh{refresh}"] = round(
            d_bin / refresh + d_step, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
