"""CLI: online RGB-D mapping over a dataset (examples/replica_rgbd.cpp).

Usage (mirrors the reference CLI contract, examples/replica_rgbd.cpp:49-61):

  python -m legslam_tpu.apps.replica_rgbd \
      --data /path/to/Replica/office0 --out ./output/office0 \
      [--cfg cfg/gaussian_mapper/RGB-D/Replica/office0.yaml] \
      [--camera-cfg cfg/camera/RGB-D/Replica/office0.yaml] \
      [--kf-stride 8] [--max-frames N] [--capacity 262144] \
      [--encoder-weights dir] [--no-lf]

Prints per-run "Average FPS" and "Total time" lines like the reference
(examples/replica_rgbd.cpp:196-199) and writes the experiment/ply artifact
tree plus TrackingTime.txt and trajectory files.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--out", default="./output/run")
    parser.add_argument("--cfg", default=None,
                        help="gaussian_mapper YAML (cfg/gaussian_mapper/...)")
    parser.add_argument("--camera-cfg", default=None,
                        help="camera YAML (cfg/camera/...) overriding the "
                             "dataset's intrinsics, incl. dist_coeffs")
    parser.add_argument("--kf-stride", type=int, default=8)
    parser.add_argument("--frontend", default="trajectory",
                        choices=("trajectory", "visual"),
                        help="trajectory = GT-pose playback; visual = "
                        "KLT+RANSAC tracking (GT poses ignored)")
    parser.add_argument("--sensor", default="auto",
                        choices=("auto", "rgbd", "mono", "stereo",
                                 "rgbd-inertial", "mono-inertial",
                                 "stereo-inertial"),
                        help="sensor mode for the visual frontend + the "
                        "mapper densify branch; auto sniffs the dataset "
                        "(stereo pairs -> stereo, no depth -> mono, "
                        "+'-inertial' when an IMU stream is present)")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--capacity", type=int, default=1 << 18)
    parser.add_argument("--iters-per-frame", type=int, default=1)
    parser.add_argument("--encoder-weights", default=None,
                        help="dir with dinov2.npz/pca.npz for the LF encoder")
    parser.add_argument("--no-lf", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-per-tile", type=int, default=2048,
                        help="per-tile compositing cap (xla backend)")
    parser.add_argument("--tile-batch", type=int, default=32)
    parser.add_argument("--chunk", type=int, default=None,
                        help="compositing depth-chunk size (default: "
                             "RasterizeConfig.chunk; small scenes can "
                             "drop to 64)")
    parser.add_argument("--max-span-x", type=int, default=None)
    parser.add_argument("--max-span-y", type=int, default=None,
                        help="static per-gaussian tile-span caps "
                             "(pairs beyond them are dropped and counted "
                             "in overflow_pairs)")
    parser.add_argument("--backend", default=None,
                        help="override compositing backend (xla|pallas)")
    parser.add_argument("--mm-dtype", default=None,
                        help="MXU input dtype for the pallas kernels "
                        "(bfloat16|float32; default bfloat16 on pallas)")
    parser.add_argument("--n-views", type=int, default=1,
                        help="data-parallel keyframes per mapping tick "
                             "(multi-chip mesh axis; parallel/sharded.py)")
    parser.add_argument("--spatial-strips", type=int, default=1,
                        help="tile-row strips per view (multi-chip mesh "
                             "axis; parallel/spatial.py)")
    parser.add_argument("--shard-store", action="store_true",
                        help="capacity-shard (FSDP-style) the gaussian "
                             "store over the mesh — each device owns "
                             "capacity/D rows (parallel/capacity.py; "
                             "composes with --spatial-strips or stands "
                             "alone on a 1D data mesh)")
    parser.add_argument("--binning-refresh", type=int, default=4,
                        help="per-view binning cache interval (1 = exact)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace of the mapping "
                             "loop to this dir")
    args = parser.parse_args(argv)

    from legslam_tpu.data.datasets import open_dataset
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.trajectory import TrajectoryFrontend
    from legslam_tpu.utils.runtime import enable_compilation_cache

    import dataclasses as _dc
    import jax as _jax

    from legslam_tpu.config import RasterizeConfig

    enable_compilation_cache()
    backend = args.backend or (
        "pallas" if _jax.default_backend() not in ("cpu",) else "xla")
    # bf16 MXU inputs by default on the kernel path: measured color max err
    # 4e-3, grad cos 0.999997 vs exact f32 (tests/test_mm_dtype.py)
    mm = args.mm_dtype or ("bfloat16" if backend == "pallas" else "float32")
    # separable exponent evaluation on the kernel path: exact to f32
    # reassociation (tests/test_power_mode.py::test_sep_modes_near_exact),
    # ~2.4 ms/step faster than the per-element VPU chain at 640x480
    pm = "sep3" if backend == "pallas" else "vpu"
    extra = {k: v for k, v in (("chunk", args.chunk),
                               ("max_span_x", args.max_span_x),
                               ("max_span_y", args.max_span_y)) if v}
    # p_slabs stays 0: the watermark slab-skip measured WORSE in-step
    # (scannet bench 16.40 -> 12.34 it/s; see ops/slabs.py docstring)
    cfg = RasterizeConfig(backend=backend, tile_batch=args.tile_batch,
                          mm_dtype=mm, power_mode=pm, **extra)
    opt = mp = None
    cam_intr = None
    if args.cfg:
        from legslam_tpu.config import load_run_config
        opt, mp, cam_intr = load_run_config(args.cfg, args.camera_cfg)
    elif args.camera_cfg:
        from legslam_tpu.config import intrinsics_from_yaml, load_opencv_yaml
        cam_intr = intrinsics_from_yaml(load_opencv_yaml(args.camera_cfg))
    ds = open_dataset(args.data)
    intr = {**ds.intrinsics, **(cam_intr or {})}
    sensor = args.sensor
    if sensor == "auto":
        # EuRoC-style loaders expose a stereo baseline + right images;
        # loaders with no depth at all are monocular (System.h:67-75
        # sensor enum — the reference selects per-example binary instead)
        probe = ds.read(0)
        if getattr(probe, "color_right", None) is not None:
            sensor = "stereo"
        elif probe.depth is None:
            sensor = "mono"
        else:
            sensor = "rgbd"
        if getattr(ds, "imu_between", None) is not None and \
                getattr(ds, "_imu", None) is not None:
            sensor += "-inertial"   # EuRoC imu0 present (System.h:67-75)
    has_imu = sensor.endswith("-inertial") and \
        getattr(ds, "imu_between", None) is not None
    base_sensor = sensor[:-len("-inertial")] if \
        sensor.endswith("-inertial") else sensor
    if args.frontend == "visual":
        from legslam_tpu.slam.tracking import TrackingFrontend
        frontend = TrackingFrontend(
            intr, sensor=sensor,
            stereo_baseline=intr.get("stereo_baseline",
                                     getattr(ds, "baseline", 0.0)))
    else:
        frontend = TrajectoryFrontend(intr, kf_stride=args.kf_stride)
    mapper = GaussianMapper(frontend.queue, intr, opt=opt, mp=mp, cfg=cfg,
                            capacity=args.capacity, result_dir=args.out,
                            seed=args.seed, max_per_tile=args.max_per_tile,
                            include_lang_feat=not args.no_lf,
                            binning_refresh_interval=args.binning_refresh,
                            n_views=args.n_views,
                            spatial_strips=args.spatial_strips,
                            shard_store=args.shard_store,
                            sensor_type="monocular" if base_sensor == "mono"
                            else base_sensor)

    encoder = None
    if args.encoder_weights and not args.no_lf:
        from legslam_tpu.models.weights_io import load_encoder
        encoder = load_encoder(args.encoder_weights)

    n = len(ds) if args.max_frames is None else min(len(ds),
                                                    args.max_frames)
    track_times = []
    if args.profile_dir:
        from legslam_tpu.utils.runtime import profile_trace
        import contextlib
        prof = profile_trace(args.profile_dir)
    else:
        import contextlib
        prof = contextlib.nullcontext()
    t_start = time.perf_counter()
    it = iter(ds.iter_prefetched())
    with prof:
        for i in range(n):
            frame = next(it)
            t0 = time.perf_counter()
            lf = None
            if encoder is not None:
                # keep the LF image ON DEVICE: the keyframe path accepts
                # jax arrays (keyframe.py jnp.asarray is a no-op), so the
                # encoder dispatch overlaps the host-side tracking below
                # instead of forcing a per-frame host sync + transfer
                lf = encoder.create_language_features(frame.color)
            if args.frontend == "visual":
                frontend.track(frame, lf_image=lf,
                               color_right=frame.color_right,
                               imu=ds.imu_between(i) if has_imu else None)
            else:
                frontend.track(frame, lf_image=lf)
            mapper.drain_operations()
            if mapper.state is None and mapper.has_met_initial_conditions():
                mapper.initialize_map()
            if mapper.state is not None:
                for _ in range(args.iters_per_frame):
                    mapper.train_iteration()
            track_times.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_start
    frontend.finish()

    # short sequences may never hit min_num_initial_map_kfs while feeding;
    # the feed is done now, so force initialization from whatever arrived
    mapper.drain_operations(limit=10_000)
    if mapper.state is None and len(mapper.keyframes):
        mapper.initialize_map()

    # tail optimization + artifacts (gaussian_mapper.cpp:538-553)
    for _ in range(int(0.8 * mapper.opt.densification_interval)):
        mapper.train_iteration()
    base = mapper.save("experiment")
    stats = mapper.record_keyframe_metrics("experiment")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "TrackingTime.txt"), "w") as f:
        f.writelines(f"{t}\n" for t in track_times)
    # GpuPeakUsageMB.txt equivalent (examples/replica_rgbd.cpp:280-294)
    from legslam_tpu.utils.runtime import save_peak_memory
    save_peak_memory(os.path.join(args.out, "TpuPeakUsageMB.txt"))
    # trajectory artifacts in all three reference formats
    # (System::SaveTrajectoryTUM/EuRoC/KITTI, examples/replica_rgbd.cpp:
    # 208-218; GT-pose frontend: poses are the input poses)
    from legslam_tpu.utils.trajectory_io import (save_trajectory_euroc,
                                                 save_trajectory_kitti,
                                                 save_trajectory_tum)
    stamps, c2ws = [], []
    for fid, kf in sorted(mapper.keyframes.items()):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = kf.R.T
        T[:3, 3] = -(kf.R.T @ kf.t)
        stamps.append(kf.timestamp)
        c2ws.append(T)
    save_trajectory_tum(
        os.path.join(args.out, "CameraTrajectory_TUM.txt"), stamps, c2ws)
    save_trajectory_euroc(
        os.path.join(args.out, "CameraTrajectory_EuRoC.txt"), stamps, c2ws)
    save_trajectory_kitti(
        os.path.join(args.out, "CameraTrajectory_KITTI.txt"), stamps, c2ws)

    print(f"Total time: {total:.2f}")
    print(f"Average FPS: {n / total:.3f}")
    print(f"Keyframes: {len(mapper.keyframes)}  "
          f"Gaussians: {int(mapper.state.num_valid())}  "
          f"Iterations: {mapper.iteration}")
    print(f"PSNR-GS: {stats['psnr']:.2f}  DSSIM: {stats['dssim']:.4f}  "
          f"render: {stats['render_ms']:.1f} ms")
    print(f"Artifacts: {base}")


if __name__ == "__main__":
    main()
