"""Test configuration: force CPU with 8 virtual devices so sharding tests run
fast and without TPU hardware.

The container's sitecustomize registers and eagerly initializes the axon TPU
PJRT plugin at interpreter start, so env vars alone are too late — we switch
the platform in-process and clear the initialized backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except AttributeError:
    from jax.extend import backend as _jeb
    _jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long e2e tests (skip with -m 'not slow' for a quick pass)")
    config.addinivalue_line(
        "markers",
        "smoke: core-correctness tier (~5 min: pallas-vs-XLA oracle "
        "parity, tiled-vs-oracle render, train-step convergence, Adam "
        "parity) — run with -m smoke between perf commits; the full "
        "quick pass (-m 'not slow') stays the bar before a milestone "
        "commit")


# The smoke tier is curated by test id so perf work has a fast bar that
# still catches kernel regressions (timings from the round-3 full run;
# total ~290 s on the 1-CPU box).
_SMOKE = {
    "test_pallas_grad.py::test_pallas_backward_matches_xla",
    "test_pallas_composite.py::test_pallas_forward_matches_xla",
    "test_rasterize.py::test_tiled_matches_oracle",
    "test_train_step.py::test_loss_decreases",
    "test_gaussians.py::test_adam_matches_torch",
    "test_gaussians.py::test_densify_clone_and_split",
    "test_losses.py",
    # frontend/mapper representatives so perf commits can't silently
    # break tracking (VERDICT r3 weak #7): the full visual frontend over
    # the native C++ kernels (~65 s), the pose-estimation units, and the
    # pose-graph solver behind loop closing
    "test_native_tracking.py",
    "test_tracking.py::test_rigid_align_recovers_exact_pose",
    "test_tracking.py::test_ransac_rejects_outliers",
    "test_pose_graph.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in _SMOKE or rel.split("::")[0] in _SMOKE:
            item.add_marker(pytest.mark.smoke)


# The full quick tier compiles many hundreds of XLA CPU executables in one
# process; with round 4's suite growth that accumulation started
# SEGFAULTING the interpreter inside XLA's backend_compile after ~228
# tests (2/2 repro; every file passes in isolation). Bound the in-process
# accumulation instead: drop every jit/pjit executable cache at file
# boundaries every few files. Costs recompiles (the suite is
# correctness-, not speed-critical); keeps the process state bounded no
# matter how much the suite grows.
_CLEAR_EVERY_FILES = 3
_seen_files: list[str] = []


def pytest_runtest_teardown(item, nextitem):
    mod = item.nodeid.split("::")[0]
    if not _seen_files or _seen_files[-1] != mod:
        _seen_files.append(mod)
        if len(_seen_files) % _CLEAR_EVERY_FILES == 0:
            import gc
            jax.clear_caches()
            gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
