"""Derive the converged-store opacity/scale distribution for the bench model.

The bench synthesizes a "steady state" store (bench.py
steady_state_scale_clamp models the 20 px prune bound); this tool grounds
the OPACITY side of that model: it runs the real online mapper on a
synthetic RGB-D sequence to steady state (densify/prune/opacity training
all active, Replica schedule: opacity_reset_interval=0) and prints the
surviving store's opacity quantiles. bench.py embeds the resulting
quantile table — a converged store never holds the raw
inverse_sigmoid(0.1) init (opacities train up; the densify step prunes
< densify_min_opacity=0.02, gaussian_mapper.cpp:751), and opacity gates
BOTH perf mechanisms (the kernels' T<1e-4 early termination and binning's
opacity-aware effective radius + ellipse cull), so the init-opacity store
is an operating point no real run ever measures.

Usage: python tools/derive_steady_state.py  (TPU; STEADY_SMOKE=1 tiny CPU)
Env: STEADY_ITERS (default 3000), STEADY_W/H, STEADY_CAP.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from legslam_tpu.config import (MapperParams, OptimizationParams,
                                    RasterizeConfig)
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.trajectory import TrajectoryFrontend
    from legslam_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    smoke = os.environ.get("STEADY_SMOKE") == "1"
    width = int(os.environ.get("STEADY_W", "320" if smoke else "640"))
    height = int(os.environ.get("STEADY_H", "192" if smoke else "480"))
    iters = int(os.environ.get("STEADY_ITERS", "60" if smoke else "3000"))
    capacity = int(os.environ.get("STEADY_CAP",
                                  str(1 << (13 if smoke else 17))))

    cfg = RasterizeConfig(
        tile_h=16, tile_w=128, max_span_x=4, max_span_y=8, chunk=256,
        backend="pallas", pallas_interpret=smoke,
        max_pairs=1 << (14 if smoke else 19), mm_dtype="bfloat16",
        power_mode="sep3")
    ds = SyntheticDataset(n_frames=48, width=width, height=height,
                          n_gaussians=2000 if smoke else 20000, seed=3,
                          clutter_ratio=0.0, revolutions=0.6)
    frontend = TrajectoryFrontend(ds.intrinsics, kf_stride=2,
                                  max_corners=128)
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics,
        opt=OptimizationParams(opacity_reset_interval=0,
                               densify_from_iter=200,
                               densification_interval=100,
                               densify_until_iter=iters * 3 // 4),
        mp=MapperParams(min_num_initial_map_kfs=8),
        cfg=cfg, capacity=capacity, result_dir="/tmp/steady_state",
        binning_refresh_interval=1)
    for frame in ds:
        frontend.track(frame)
    frontend.finish()
    mapper.drain_operations(limit=256)
    assert mapper.has_met_initial_conditions()
    mapper.initialize_map()
    for i in range(iters):
        mapper.train_iteration()
        if (i + 1) % 500 == 0:
            jax.block_until_ready(mapper.state.params.xyz)
            print(f"iter {i + 1}: n_valid="
                  f"{int(jnp.sum(mapper.state.valid))} "
                  f"loss={float(mapper._last_aux.loss):.4f}",
                  file=sys.stderr)
    jax.block_until_ready(mapper.state.params.xyz)

    st = mapper.state
    valid = np.array(st.valid)
    op = np.array(jax.nn.sigmoid(st.params.opacity[:, 0]))[valid]
    sc = np.array(jnp.exp(st.params.scaling))[valid]
    qs = np.linspace(0.0, 1.0, 21)
    print(json.dumps(dict(
        iters=iters, width=width, height=height,
        n_valid=int(valid.sum()), capacity=capacity,
        opacity_quantiles=[round(float(v), 4)
                           for v in np.quantile(op, qs)],
        opacity_mean=round(float(op.mean()), 4),
        frac_above_half=round(float((op > 0.5).mean()), 4),
        scale_max_quantiles=[round(float(v), 5)
                             for v in np.quantile(sc.max(1), qs)],
    )))


if __name__ == "__main__":
    main()
