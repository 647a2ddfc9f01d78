"""Runtime setup helpers: compilation cache, platform switches, profiling.

The axon remote-compile path can take minutes per executable; the
persistent compilation cache makes warm starts instant across processes.
(The reference has no analogue — CUDA kernels are AOT-built; SURVEY.md §5
tracing notes.)
"""
from __future__ import annotations

import os
import time
from contextlib import contextmanager

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    if path is None:
        # per-platform subdir: axon-compiled artifacts carry host machine
        # features that poison CPU loads (observed SIGILL-risk warnings)
        platform = jax.default_backend()
        path = os.path.join(_CACHE_DIR, platform)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def force_cpu(n_devices: int = 8) -> None:
    """Switch an already-initialized process to CPU (tests/tools)."""
    import jax
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except AttributeError:
        from jax.extend import backend as jeb
        jeb.clear_backends()


@contextmanager
def timed(label: str, sink: list | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))


@contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace scope — the TPU-native equivalent of the
    reference's chrono probes (SURVEY.md §5 names this): view the resulting
    trace in TensorBoard / Perfetto. No-op teardown on backends that don't
    support tracing."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        yield log_dir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:  # pragma: no cover — trace never started
            pass


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes_in_use/peak_bytes_in_use when the
    backend reports them) — the c10 CUDACachingAllocator-stats equivalent
    (examples/replica_rgbd.cpp:280-294)."""
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # pragma: no cover — backend without stats
            stats = {}
        out[str(d)] = {k: int(v) for k, v in stats.items()
                       if isinstance(v, (int, float))}
    return out


def save_peak_memory(path: str) -> dict:
    """Write the reference's GpuPeakUsageMB.txt-style artifact
    (TpuPeakUsageMB layout: one 'device peak_mb in_use_mb' line each)."""
    stats = device_memory_stats()
    with open(path, "w") as f:
        for dev, s in stats.items():
            peak = s.get("peak_bytes_in_use", 0) / 2**20
            cur = s.get("bytes_in_use", 0) / 2**20
            f.write(f"{dev} peak_mb={peak:.1f} in_use_mb={cur:.1f}\n")
    return stats
