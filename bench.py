"""Benchmark: online mapping throughput at Replica scale on one TPU chip.

Measures the steady-state rate of the per-frame mapping work the reference
binary performs (one training iteration: render RGB+LF+depth, loss,
backward, Adam — gaussian_mapper.cpp:624-798) at Replica geometry
(1200x680, fx=fy=600; cfg/ORB_SLAM3/RGB-D/Replica/office0.yaml:11-30) with a
Replica-sized gaussian store. Prints one JSON line; vs_baseline is against
the reference's published 10 FPS Replica online mapping (README.md:14).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from legslam_tpu.config import OptimizationParams, RasterizeConfig
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.utils.camera import CameraView

    from legslam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    width, height = (320, 192) if smoke else (1200, 680)
    n_points = 20_000 if smoke else 200_000
    capacity = 1 << (15 if smoke else 18)
    iters = 3 if smoke else 20

    cfg = RasterizeConfig(
        tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
        chunk=256, tile_batch=16, backend=backend,
        max_pairs=1 << (16 if smoke else 20))
    opt = OptimizationParams()

    rng = np.random.default_rng(0)
    # synthetic Replica-like cloud: room-scale box in front of the camera
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=capacity)

    view = CameraView.create(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        width, height, fx=600.0, fy=600.0)
    gt_color = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(height, width, 64)), jnp.float32)
    gt_depth = jnp.asarray(
        rng.uniform(0.5, 8.0, size=(height, width)), jnp.float32)
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)

    def step(s, i):
        return train_step(
            s, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
            bg, jnp.asarray(float(i)), 1.0,
            width=width, height=height, active_sh_degree=3, opt=opt,
            cfg=cfg, max_per_tile=2048)

    # compile + warmup
    st, aux = step(st, 0)
    jax.block_until_ready(aux.loss)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        st, aux = step(st, i + 1)
        float(aux.loss)  # per-step host sync: axon's block_until_ready alone
        # has been observed not to force the dispatched chain
        times.append(time.perf_counter() - t0)
    # median: the axon tunnel intermittently stalls whole seconds per call
    # (service-side; observed 10x degradation over hours with identical
    # executables) — the median resists those stalls
    times.sort()
    dt = times[len(times) // 2]

    fps = 1.0 / dt
    scale = f"{width}x{height} render+LF+depth+bwd+adam, {n_points} gaussians"
    print(json.dumps({
        "metric": "replica_scale_mapping_iteration_fps",
        "value": round(fps, 3),
        "unit": f"iters/s ({scale}, {backend} backend)",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
