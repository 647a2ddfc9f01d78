"""Benchmark: online mapping throughput at Replica scale on one TPU chip.

Measures the steady-state rate of the per-frame mapping work the reference
binary performs (one training iteration: render RGB+LF+depth, loss,
backward, Adam — gaussian_mapper.cpp:624-798) at Replica geometry
(1200x680, fx=fy=600; cfg/ORB_SLAM3/RGB-D/Replica/office0.yaml:11-30) with a
Replica-sized gaussian store, plus full-pipeline variants.

The default run (BENCH_VARIANT unset / "all") emits ONE JSON LINE PER
VARIANT in this order — system FPS at both scales (the unit behind the
reference's 10/18 FPS headline: tracking + encoder + mapping per frame,
examples/replica_rgbd.cpp:146-199), frame-with-encoder at both scales,
ScanNet-scale mapping iterations — and LAST the Replica-scale mapping
headline (the driver parses the final line).

Variants (env BENCH_VARIANT, single-variant runs):
  mapping   Replica-scale mapping iterations only (the round-1..3 unit).
  scannet   same at ScanNet frame geometry 640x480 (18 FPS baseline).
  frame     mapping + the DINOv2+PCA language encoder per measured frame
            (examples/replica_rgbd.cpp:182); random-init weights,
            identical compute to converted ones. BENCH_SCALE=scannet for
            the 640x480 variant.
  system    the FULL online pipeline per frame — visual tracking
            (KLT/RANSAC) + encoder + keyframe ingest/densify + one
            mapping iteration — over a synthetic RGB-D sequence,
            pipelined with a BOUNDED 6-frame mapping lag (the reference
            overlaps mapping in a thread, examples/replica_rgbd.cpp:122;
            here every frame fetches the step dispatched 6 frames ago,
            so the loop throttles to the device's sustained rate).
            BENCH_SCALE=scannet for 640x480. Median per-frame FPS.
Other knobs:
  BENCH_BINNING_REFRESH  per-view binning cache interval (default 8).
  BENCH_BACKEND          pallas (default) | xla.
  BENCH_SMOKE=1          tiny-shape smoke.
"""
import json
import os
import time

import numpy as np


def steady_state_scale_clamp(st, pts, fx: float):
    """Clamp fresh knn-init log-scales to the mapper's big-point prune
    bound (screen radius <= 20 px at each point's own depth): the
    reference prunes any gaussian beyond size_th=20 once steady state is
    reached (densifyAndPrune size_th / prune_big_point_after_iter,
    src/gaussian_mapper.cpp:737-755 + gaussian_model.cpp:806-826), so a
    converged online-mapping store cannot carry larger footprints. A raw
    200k knn-init cloud carries ~100 px footprints that no real mapping
    iteration ever composites AND silently exceeds the 4x8 tile-span
    caps (121k dropped pairs at 1200x680); with the clamp the bench is
    span-exact (span_overflow == 0). Measured pair footprint at
    1200x680: raw 890k -> clamped 531k."""
    import jax.numpy as jnp
    z = np.maximum(pts[:, 2], 0.2)
    smax = np.log((20.0 / 3.0) * z / fx).astype(np.float32)
    sc = np.array(st.params.scaling)
    n = pts.shape[0]
    sc[:n] = np.minimum(sc[:n], smax[:, None])
    return st.replace(params=st.params.replace(scaling=jnp.asarray(sc)))


# Converged-store opacity quantiles (q = 0, 0.05, ..., 1.0), derived by
# tools/derive_steady_state.py from a real online-mapping run to steady
# state (3000 iters, synthetic RGB-D, Replica schedule incl.
# opacity_reset_interval=0 and densify/prune): opacities TRAIN UP and the
# densify step prunes < 0.02 (gaussian_mapper.cpp:751), so a converged
# store is near-opaque (mean 0.957, 95.4% above 0.5) — nothing like the
# inverse_sigmoid(0.1) init. Opacity gates both perf mechanisms (the
# kernels' T<1e-4 early termination and binning's opacity-aware
# effective radius / ellipse cull), so benching at init opacity measures
# an operating point no real run ever holds.
STEADY_OPACITY_QUANTILES = (
    0.0039, 0.6319, 0.9997, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


def steady_state_opacity(st, rng):
    """Sample per-gaussian opacities from the derived converged-store
    distribution (inverse-CDF over STEADY_OPACITY_QUANTILES) and store
    them as logits. Clamped below 1 so inverse_sigmoid stays finite (the
    kernels clamp alpha at 0.99 regardless, forward.cu:344)."""
    import jax.numpy as jnp
    n = st.params.opacity.shape[0]
    qs = np.linspace(0.0, 1.0, len(STEADY_OPACITY_QUANTILES))
    u = rng.uniform(size=n)
    op = np.interp(u, qs, np.asarray(STEADY_OPACITY_QUANTILES))
    op = np.clip(op, 1e-4, 1.0 - 1e-4).astype(np.float32)
    logits = np.log(op / (1.0 - op))[:, None]
    return st.replace(params=st.params.replace(
        opacity=jnp.asarray(logits)))


def _make_cfg(backend, smoke):
    from legslam_tpu.config import RasterizeConfig
    # bf16 MXU inputs for the compositing kernels: measured (CPU interpret,
    # vs exact f32): color max err 4e-3, grad cosine 0.999997, transmittance
    # exact (hi/lo prefix split) — far below mapping-convergence noise
    mm_dtype = os.environ.get("BENCH_MM_DTYPE", "bfloat16")
    # Gaussian-exponent evaluation (quality pinned in
    # tests/test_power_mode.py, same contract shape as mm_dtype).
    # "sep3" factors the quadratic's x/y terms out of the [npix, chunk]
    # plane (exact to f32 reassociation; measured 640x480 v5e:
    # fwd 13.3 vs 14.9 ms, bwd 20.5 vs 21.3, step_cached 61.3 vs 63.7).
    # "mxu" (one [npix,8]@[8,chunk] matmul) measured neutral-to-worse
    # (step 150 vs 144) — kept as a knob.
    power_mode = os.environ.get("BENCH_POWER_MODE", "sep3")
    # rank-block bucketed binning (BucketedBinning): n_buckets
    # independent sorts of the emission buffer's rank blocks instead of
    # one flat sort; bucket_cap bounds gathered pairs per bucket
    # (overflow counted, sentinel-dropped). MEASURED FAR WORSE in-step
    # (scannet 17.8 -> 4.4 it/s at nb=64) — knob kept for re-measurement.
    n_buckets = int(os.environ.get("BENCH_NBUCKETS", "1"))
    bucket_cap = int(os.environ.get("BENCH_BUCKET_CAP", "8192"))
    # watermark slab-skip of the P-bound segments (preprocess/SH/adam/
    # stats; ops/slabs.py) — exact but MEASURED WORSE in-step (scannet
    # 16.40 -> 12.34 it/s at p_slabs=8: the switch boundary breaks
    # XLA fusion across segments and the head/tail concats re-materialize
    # [P,...] buffers, costing more than the ~24% dead-tail traffic it
    # skips at 200k/262k occupancy). Default OFF; knob kept.
    p_slabs = int(os.environ.get("BENCH_P_SLABS", "0"))
    return RasterizeConfig(
        tile_h=16, tile_w=128, max_span_x=4, max_span_y=8,
        chunk=256, tile_batch=16, backend=backend,
        max_pairs=1 << (16 if smoke else 20), mm_dtype=mm_dtype,
        power_mode=power_mode, n_buckets=n_buckets, bucket_cap=bucket_cap,
        p_slabs=p_slabs)


def _make_encoder(rng):
    import jax
    import jax.numpy as jnp

    from legslam_tpu.models import dinov2 as D
    from legslam_tpu.models import pca as PCA
    from legslam_tpu.models.encoder import LanguageFeaturesEncoder
    dcfg = D.DinoV2Config()
    dparams = D.init_params(dcfg, jax.random.key(0))
    pparams = PCA.PCAParams(
        mean=jnp.zeros(768, jnp.float32),
        components=jnp.asarray(rng.normal(size=(64, 768)), jnp.float32))
    return LanguageFeaturesEncoder(dparams, pparams, dcfg)


def _system_variant(width, height, n_points, cfg, refresh, smoke,
                    baseline, scale_name, motion="default"):
    """BENCH_VARIANT=system: tracking + encoder + mapping per frame.

    Timing discipline (the axon tunnel compiles remotely, minutes per
    NEW executable, so a single mid-timing compile would swamp the
    number): pyramid sub-level training is disabled (full-res every
    iteration — the most expensive level — keeping the executable set
    closed), warmup runs until the whole set has compiled, and the
    report is the MEDIAN of per-frame times under windowed pipelining
    (see the timing block below)."""
    import jax

    from legslam_tpu.config import MapperParams
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.tracking import TrackingFrontend

    rng = np.random.default_rng(0)
    warm, timed = (2, 3) if smoke else (10, 30)
    # 0.45 deg/frame orbit — Replica-like sensor motion (office0 covers
    # ~2000 frames/room; the old 2.25 deg/frame forced a keyframe every
    # other frame, an 8x-too-hot ingest rate no real sequence produces).
    # motion="kfheavy": 4x the angular rate — a sensitivity point for the
    # ingest/densify share (real ScanNet sequences keyframe far more
    # aggressively than a smooth orbit); reported as an informational
    # variant, not a headline.
    revs = 0.2 if motion == "kfheavy" else 0.05
    ds = SyntheticDataset(n_frames=warm + timed, width=width, height=height,
                          n_gaussians=max(n_points // 5, 2000), seed=3,
                          clutter_ratio=0.0, revolutions=revs)
    ds._cfg = cfg  # render GT frames through the bench (pallas) path
    ds.preload()   # jitted render + on-disk npz cache (cold: one compile)
    frames = [ds.read(i) for i in range(len(ds))]  # pre-generate, untimed

    encoder = _make_encoder(rng)
    frontend = TrackingFrontend(ds.intrinsics, sensor="rgbd")
    mapper = GaussianMapper(
        frontend.queue, ds.intrinsics, cfg=cfg,
        mp=MapperParams(do_gaus_pyramid_training=False),
        capacity=1 << (15 if smoke else 18),
        result_dir="/tmp/bench_system",
        binning_refresh_interval=refresh)

    # sensor-native u8 copies for the encoder upload (a real pipeline
    # decodes u8 images; shipping f32 over the host link quadruples the
    # per-frame transfer)
    frames_u8 = [np.clip(f.color * 255.0, 0, 255).astype(np.uint8)
                 for f in frames]
    u8 = {id(f): u for f, u in zip(frames, frames_u8)}

    import cv2
    enc_size = encoder.cfg.image_size

    def frame_work(frame):
        # host-side resize to encoder geometry BEFORE upload (like the
        # reference's cv2 resize ahead of the ONNX session,
        # language_features_encoder.cpp) — the host link runs ~24 MB/s
        # through the tunnel, so bytes shipped are the system floor
        small = cv2.resize(u8[id(frame)], (enc_size, enc_size),
                           interpolation=cv2.INTER_LINEAR)
        # on-device LF: the encoder dispatch overlaps host-side tracking
        # (the keyframe path accepts jax arrays)
        lf = encoder.create_language_features(small)
        frontend.track(frame, lf_image=lf)
        mapper.drain_operations()
        if mapper.state is None and mapper.has_met_initial_conditions():
            mapper.initialize_map()
        if mapper.state is not None:
            mapper.train_iteration()

    for f in frames[:warm]:          # warmup: compiles + map init
        frame_work(f)
    if mapper.state is None:
        mapper.initialize_map()
    # touch every remaining executable before the clock starts: fresh +
    # cached-binning steps (and their trim variants) need > refresh
    # iterations on the same keyframe set
    for _ in range(refresh + 2):
        mapper.train_iteration()
    float(mapper._last_aux.loss)

    # Windowed pipelining: the reference hides mapping behind a thread
    # (examples/replica_rgbd.cpp:122); the TPU-native equivalent is
    # asynchronous dispatch with BOUNDED lag — a FETCHER THREAD forces
    # each step's loss (a value fetch, not block_until_ready: axon's
    # block_until_ready fails to force execution), and the main loop
    # blocks whenever more than `window` steps are still unfetched, so
    # it can never report faster than the device + fetch pipeline
    # sustains. The thread mirrors the reference's mapper thread: the
    # ~30 ms tunnel round trip per fetch (measured 2026-08-21; it was
    # ~19 ms in earlier rounds) overlaps host tracking instead of
    # sitting on the critical path — the fetch RPC releases the GIL.
    # All device DISPATCH stays on the main thread; the thread only
    # forces ready values. Per-frame times include any throttle wait;
    # the median resists the tunnel's intermittent multi-second stalls.
    import threading
    from collections import deque
    window = 6
    inflight: deque = deque()
    cv = threading.Condition()
    stop = False
    fetch_err: list = []

    def _fetcher():
        while True:
            with cv:
                while not inflight and not stop:
                    cv.wait()
                if not inflight and stop:
                    return
                item = inflight.popleft()
                cv.notify_all()
            try:
                float(item)        # blocking RPC outside the lock
            except Exception as e:  # surface in the main thread
                fetch_err.append(e)
                return

    th = threading.Thread(target=_fetcher, daemon=True)
    th.start()
    times = []
    for f in frames[warm:]:
        t0 = time.perf_counter()
        frame_work(f)
        if mapper._last_aux is not None:
            with cv:
                inflight.append(mapper._last_aux.loss)
                cv.notify_all()
                while len(inflight) > window and not fetch_err:
                    cv.wait(timeout=1.0)
        times.append(time.perf_counter() - t0)
    with cv:
        stop = True
        cv.notify_all()
    th.join(timeout=600)
    if fetch_err:
        raise fetch_err[0]
    times.sort()
    dt = times[len(times) // 2]

    fps = 1.0 / dt
    suffix = "" if motion == "default" else f"_{motion}"
    mdesc = "" if motion == "default" else \
        f", {motion} motion (4x keyframe rate)"
    return {
        "metric": f"{scale_name}_scale_system_fps_track_encode_map"
                  f"{suffix}",
        "value": round(fps, 3),
        "unit": f"frames/s ({width}x{height} KLT tracking + dinov2+pca "
                f"encoder + ingest/densify + 1 mapping iter/frame, "
                f"pipelined w/ bounded 6-frame mapping lag, "
                f"{cfg.backend} backend, binning refresh {refresh}, "
                f"median per-frame{mdesc})",
        "vs_baseline": round(fps / baseline, 3),
    }


def _mapping_variant(variant, width, height, n_points, capacity, iters,
                     cfg, refresh, smoke, baseline):
    """Mapping-iteration variants: mapping | scannet | frame.

    frame = mapping + a DINOv2+PCA encoder forward per measured
    iteration (the reference's frame loop runs the encoder per frame,
    examples/replica_rgbd.cpp:182)."""
    import jax
    import jax.numpy as jnp

    from legslam_tpu.config import OptimizationParams
    from legslam_tpu.mapper.train_step import train_step
    from legslam_tpu.models import gaussians as G
    from legslam_tpu.utils.camera import CameraView

    opt = OptimizationParams()
    rng = np.random.default_rng(0)
    # synthetic Replica-like cloud: room-scale box in front of the camera
    pts = rng.uniform(-3, 3, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 8.0, size=n_points).astype(np.float32)
    cols = rng.uniform(size=(n_points, 3)).astype(np.float32)
    st = G.create_from_pcd(pts, cols, capacity=capacity)
    st = steady_state_scale_clamp(st, pts, fx=600.0)
    # steady-state OPACITY model (see STEADY_OPACITY_QUANTILES): sampled
    # from a real converged run's distribution. "init" keeps the raw
    # inverse_sigmoid(0.1) init for A/B measurement.
    if os.environ.get("BENCH_OPACITY_MODEL", "steady") != "init":
        st = steady_state_opacity(st, rng)

    view = CameraView.create(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        width, height, fx=600.0, fy=600.0)
    gt_color = jnp.asarray(rng.uniform(size=(height, width, 3)), jnp.float32)
    gt_lf = jnp.asarray(rng.normal(size=(height, width, 64)), jnp.float32)
    gt_depth = jnp.asarray(
        rng.uniform(0.5, 8.0, size=(height, width)), jnp.float32)
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)

    from legslam_tpu.ops.rasterize import compute_binning
    binning_jit = jax.jit(
        compute_binning,
        static_argnames=("width", "height", "cfg", "max_per_tile"))

    def make_binning(s):
        return binning_jit(
            s.params.xyz, jnp.exp(s.params.scaling), s.params.rotation,
            s.valid, view.world_view, view.full_proj, view.tan_fovx,
            view.tan_fovy, width=width, height=height, cfg=cfg,
            max_per_tile=2048,
            opacity=jax.nn.sigmoid(s.params.opacity[:, 0]))

    def step(s, i, binning=None, emit=False):
        return train_step(
            s, view.world_view, view.full_proj, view.cam_center,
            view.tan_fovx, view.tan_fovy, gt_color, gt_lf, gt_depth, mask,
            bg, jnp.asarray(float(i)), 1.0,
            width=width, height=height, active_sh_degree=3, opt=opt,
            cfg=cfg, max_per_tile=2048,
            binning=make_binning(s) if binning == "fresh" else binning,
            emit_kfin=emit)

    # termination-aware trim of the cached binning (ops/binning.py
    # trim_binning): the refresh step emits the fwd kernel's per-tile
    # T<1e-4 watermark; pairs past it are compacted away for the reuse
    # steps (bit-exact at the measured state — the mapper default).
    trim = os.environ.get("BENCH_TRIM", "1") == "1" and refresh > 1 \
        and cfg.backend == "pallas" and cfg.n_buckets == 1
    trim_slack = int(os.environ.get("BENCH_TRIM_SLACK", "1"))
    # ALSO pre-trim the group-leading (fresh-binning) step with the
    # PREVIOUS group's watermark (+1 extra slack chunk): the fresh step
    # otherwise composites/gathers the full untrimmed pair set just to
    # re-measure a watermark that drifts by ~a chunk per group. kfin
    # emitted on a pre-trimmed binning counts chunks from the trimmed
    # tile starts, so the reuse-step trim composes unchanged. One group
    # staler than the reuse-trim; same staleness class as the cache.
    # Like the mapper default (binning_trim_fresh + trim_fresh_max_age=3),
    # every 4th group re-measures the watermark UNTRIMMED to bound the
    # ratchet — the bench mirrors the production policy exactly.
    # Default ON (measured 2026-08-20 v5e: mapping 13.97 -> 14.05 it/s,
    # scannet 24.53 -> 24.93).
    trim_fresh = trim and os.environ.get("BENCH_TRIM_FRESH", "1") == "1"
    trim_fresh_max_age = 3  # mapper.trim_fresh_max_age
    from legslam_tpu.ops.binning import trim_binning
    trim_jit = jax.jit(trim_binning,
                       static_argnames=("max_pairs", "chunk",
                                        "slack_chunks"))

    def refresh_step(s, i, prev_kfin=None):
        """Group-leading step: fresh binning + (optionally) trim it from
        the step's watermark for the group's reuse steps."""
        binning = make_binning(s)
        if trim_fresh and prev_kfin is not None:
            binning = (trim_jit(binning[0], prev_kfin,
                                max_pairs=cfg.max_pairs, chunk=cfg.chunk,
                                slack_chunks=trim_slack + 1),
                       binning[1])
        s, aux = step(s, i, binning=binning, emit=trim)
        kfin = aux.kfin
        if trim:
            binning = (trim_jit(binning[0], kfin,
                                max_pairs=cfg.max_pairs, chunk=cfg.chunk,
                                slack_chunks=trim_slack),
                       binning[1])
        return s, aux, binning, kfin

    encoder = None
    if variant == "frame":
        encoder = _make_encoder(rng)
        frame_rgb = jnp.asarray(rng.uniform(size=(height, width, 3)),
                                jnp.float32)

    # compile + warmup (both variants when the cache is on)
    kfin = None
    if refresh > 1:
        st, aux, binning, kfin = refresh_step(st, 0)
        st, aux = step(st, 0, binning=binning)
        if trim_fresh:  # compile the pre-trimmed refresh variant too
            st, aux, binning, kfin = refresh_step(st, 0, kfin)
    else:
        st, aux = step(st, 0)
    jax.block_until_ready(aux.loss)

    # timing groups: each group holds exactly one binning refresh +
    # (refresh-1) cached steps, so the median group time / refresh is the
    # honestly amortized per-iteration cost (a plain per-iter median would
    # hide the refresh; a mean would absorb axon tunnel stalls)
    if encoder is not None:
        from legslam_tpu.mapper.train_step import upsample_lf
        up = jax.jit(upsample_lf, static_argnums=(1, 2))
        gt_lf = up(encoder.create_language_features(frame_rgb), height,
                   width)
        jax.block_until_ready(gt_lf)

    times = []
    binning = None
    fresh_age = 0
    for g in range(iters):
        t0 = time.perf_counter()
        for k in range(refresh):
            i = g * refresh + k
            if encoder is not None:
                # per-frame encoder forward feeding the mapping step's LF
                # supervision (the reference's frame loop does exactly this)
                gt_lf = up(encoder.create_language_features(frame_rgb),
                           height, width)
            if refresh > 1:
                if k == 0:
                    # mirror mapper.trim_fresh_max_age: every 4th group
                    # re-measures the watermark untrimmed
                    if trim_fresh and fresh_age < trim_fresh_max_age:
                        fresh_age += 1
                        st, aux, binning, kfin = refresh_step(
                            st, i + 1, kfin)
                    else:
                        fresh_age = 0
                        st, aux, binning, kfin = refresh_step(st, i + 1)
                else:
                    st, aux = step(st, i + 1, binning=binning)
            else:
                st, aux = step(st, i + 1)
        # host sync ONCE per group, like the production mapper
        # (loss_sync_interval pipelines dispatch): a per-iteration fetch
        # would add the ~19 ms tunnel round trip to every step. axon's
        # block_until_ready alone has been observed not to force the
        # dispatched chain, hence the value fetch.
        float(aux.loss)
        times.append((time.perf_counter() - t0) / refresh)
    # median: the axon tunnel intermittently stalls whole seconds per call
    # (service-side; observed 10x degradation over hours with identical
    # executables) — the median resists those stalls
    times.sort()
    dt = times[len(times) // 2]

    fps = 1.0 / dt
    work = "render+LF+depth+bwd+adam"
    scale_name = "scannet" if (width, height) == (640, 480) else "replica"
    metric = f"{scale_name}_scale_mapping_iteration_fps"
    if variant == "frame":
        work = "dinov2+pca encoder + " + work
        metric = f"{scale_name}_scale_frame_fps_with_encoder"
    scale = f"{width}x{height} {work}, {n_points} gaussians"
    return {
        "metric": metric,
        "value": round(fps, 3),
        "unit": f"iters/s ({scale}, {cfg.backend} backend, {cfg.mm_dtype} "
                f"mxu, binning refresh {refresh}"
                f"{'+trim' if trim else ''}"
                f"{'+trimfresh' if trim_fresh else ''})",
        "vs_baseline": round(fps / baseline, 3),
    }


def _run_one(variant, scale, smoke, backend, refresh, motion="default"):
    """Run one variant at one scale; returns the result dict."""
    if variant == "scannet":  # mapping iterations at ScanNet geometry
        scale = "scannet"
    width, height = (320, 192) if smoke else (1200, 680)
    # ScanNet frame geometry (cfg/ORB_SLAM3/RGB-D/ScanNet/
    # scene0011_00.yaml Camera.width/height) — the unit behind the
    # reference's 18 FPS ScanNet headline (README.md:14); same store
    # size and schedule as the Replica-scale run, only the frame shrinks.
    if scale == "scannet" and not smoke:
        width, height = 640, 480
    n_points = 20_000 if smoke else 200_000
    capacity = 1 << (15 if smoke else 18)
    iters = 3 if smoke else 20
    # the reference's published headlines: 10 FPS Replica / 18 FPS
    # ScanNet online mapping (README.md:14)
    baseline = 18.0 if scale == "scannet" else 10.0
    cfg = _make_cfg(backend, smoke)
    if variant == "system":
        return _system_variant(width, height, n_points, cfg, refresh,
                               smoke, baseline, scale, motion=motion)
    return _mapping_variant(variant, width, height, n_points, capacity,
                            iters, cfg, refresh, smoke, baseline)


def main():
    from legslam_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    # per-view tile-binning refresh interval (mapper binning_refresh_interval
    # knob): the sort-dominated prep pipeline is recomputed every N-th
    # iteration of a view and reused otherwise. 1 = exact per-step binning.
    refresh = int(os.environ.get("BENCH_BINNING_REFRESH", "8"))
    variant = os.environ.get("BENCH_VARIANT", "all")
    scale = os.environ.get("BENCH_SCALE", "replica")

    if variant != "all":
        print(json.dumps(_run_one(
            variant, scale, smoke, backend, refresh,
            motion=os.environ.get("BENCH_MOTION", "default"))))
        return

    # Full suite: pipeline-honest numbers first, the Replica-scale
    # mapping headline LAST (the driver parses the final JSON line).
    suite = [
        ("system", "replica", "default"),
        ("system", "scannet", "default"),
        # ingest-rate sensitivity (informational, round-4 verdict weak
        # #5): the same system loop under 4x keyframe rate
        ("system", "replica", "kfheavy"),
        ("system", "scannet", "kfheavy"),
        ("frame", "scannet", "default"),
        ("frame", "replica", "default"),
        ("scannet", "scannet", "default"),
        ("mapping", "replica", "default"),
    ]
    for v, s, mo in suite:
        res = _run_one(v, s, smoke, backend, refresh, motion=mo)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
