"""TPU perf probe: stage-level timings for the mapping train step.

Runs named stages (argv) at bench.py's Replica scale and prints one JSON
line per stage: {"stage": ..., "median_ms": ..., "n": ...}. Each timed
iteration ends with a host fetch (axon's block_until_ready alone has been
observed not to force execution). Stages share one process so relative
numbers ride the same tunnel state; every batch should include
`step_default` as the in-run baseline.

Usage: nohup python tools/perf_probe.py step_default step_chunk128 ... &
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _median_time(fn, n=8, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    stages = sys.argv[1:] or ["step_default"]

    import jax
    import jax.numpy as jnp

    from legslam_tpu.config import OptimizationParams, RasterizeConfig
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.utils.camera import CameraView
    from legslam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import os
    small = os.environ.get("PROBE_SMALL") == "1"  # CPU smoke of the script
    width, height = (256, 128) if small else (1200, 680)
    n_points = 2_000 if small else 200_000
    capacity = 1 << (12 if small else 18)
    opt = OptimizationParams()

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=capacity)
    view = CameraView.create(np.eye(3, dtype=np.float32),
                             np.zeros(3, np.float32), width, height,
                             fx=600.0, fy=600.0)
    gt_color = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(height, width, 64)), jnp.float32)
    gt_depth = jnp.asarray(rng.uniform(0.5, 8.0, size=(height, width)),
                           jnp.float32)
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)

    def make_step(cfg, **kw):
        def run():
            nonlocal st
            st, aux = train_step(
                st, view.world_view, view.full_proj, view.cam_center,
                view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth,
                mask, bg, jnp.asarray(1.0), 1.0, width=width, height=height,
                active_sh_degree=3, opt=opt, cfg=cfg, max_per_tile=2048,
                **kw)
            float(aux.loss)
        return run

    def emit(stage, fn, n=8):
        try:
            dt = _median_time(fn, n=n)
            print(json.dumps({"stage": stage,
                              "median_ms": round(dt * 1e3, 2), "n": n}),
                  flush=True)
        except Exception as e:  # keep later stages alive
            print(json.dumps({"stage": stage,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    npairs = 1 << (14 if small else 20)
    base_cfg = dict(tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
                    chunk=256, tile_batch=16, backend="pallas",
                    max_pairs=1 << 20)

    # precomputed binning inputs for micro stages
    from legslam_tpu.ops.projection import preprocess
    from legslam_tpu.ops import binning as B
    cfg0 = RasterizeConfig(**base_cfg)
    p = st.params
    pre = jax.jit(lambda: preprocess(
        p.xyz, jnp.exp(p.scaling), p.rotation, st.valid, view.world_view,
        view.full_proj, width, height, 600.0, 600.0, view.tan_fovx,
        view.tan_fovy, 1.0))()
    jax.block_until_ready(pre.mean2d)

    for stage in stages:
        if stage == "step_default":
            emit(stage, make_step(cfg0))
        elif stage == "step_chunk128":
            emit(stage, make_step(RasterizeConfig(**{**base_cfg,
                                                     "chunk": 128})))
        elif stage == "step_span24":
            emit(stage, make_step(RasterizeConfig(
                **{**base_cfg, "max_span_x": 2, "max_span_y": 4})))
        elif stage == "binning":
            f = jax.jit(lambda: B.bin_gaussians(pre, width, height, cfg0))
            b = f()
            emit(stage, lambda: int(f().num_rendered))
            print(json.dumps({"stage": "binning.num_rendered",
                              "value": int(b.num_rendered)}), flush=True)
        elif stage.startswith("sort_"):
            if stage == "sort_flat":
                n = capacity * 32
            elif stage == "sort_flat_small":
                n = capacity * 8
            else:
                n = capacity * 32
            keys = jnp.asarray(
                rng.integers(0, 2**30, size=n, dtype=np.int32))
            if stage == "sort_batched16":
                keys = keys.reshape(16, -1)
                f = jax.jit(lambda k: jnp.sort(k, axis=-1))
            else:
                f = jax.jit(jnp.sort)
            emit(stage, lambda: float(f(keys).ravel()[0]))
        elif stage.startswith("gather_"):
            from legslam_tpu.ops.pallas.composite import _chunked_take_raw as _chunked_take
            dt_ = jnp.bfloat16 if stage.endswith("bf16") else jnp.float32
            src = jnp.asarray(rng.normal(size=(capacity, 128)), dt_)
            idx = jnp.asarray(
                rng.integers(0, capacity, size=npairs, dtype=np.int32))
            f = jax.jit(lambda s, i: _chunked_take(s, i, i.shape[0]))
            emit(stage, lambda: float(f(src, idx)[0, 0]))
        elif stage.startswith("scatter_"):
            dt_ = jnp.bfloat16 if stage.endswith("bf16") else jnp.float32
            g = jnp.asarray(rng.normal(size=(npairs, 128)), dt_)
            idx = jnp.asarray(
                rng.integers(0, capacity, size=npairs, dtype=np.int32))
            acc0 = jnp.zeros((capacity, 128), dt_)
            f = jax.jit(lambda a, i, u: a.at[i].add(u, mode="drop"))
            emit(stage, lambda: float(f(acc0, idx, g)[0, 0]))
        elif stage == "loss_fwdbwd":
            from legslam_tpu.ops import losses

            def lf(c, l, d):
                return losses.mapping_loss(c, gt_color, l, gt_lf, d,
                                           gt_depth, mask, 0.2)
            f = jax.jit(jax.value_and_grad(lf, argnums=(0, 1, 2)))
            c = gt_color + 0.01
            l = gt_lf + 0.01
            d = gt_depth + 0.01
            emit(stage, lambda: float(f(c, l, d)[0]))
        else:
            print(json.dumps({"stage": stage, "error": "unknown stage"}),
                  flush=True)

    print(json.dumps({"stage": "__done__"}), flush=True)


if __name__ == "__main__":
    main()
