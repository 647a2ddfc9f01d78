"""ctypes binding + on-demand build of the native tracking kernels.

The reference's pose source is wholly native (the ORB-SLAM3 C++ fork); our
frontend keeps orchestration in Python but runs the per-frame hot CV
kernels — Shi-Tomasi detection and pyramidal Lucas-Kanade flow — in C++
(native/tracking_core.cpp). The shared library is compiled once with g++
on first use and cached next to the source; loading is ctypes-only (no
pybind dependency, per the environment constraints).

Selection order in slam/tracking.py: this module when importable/buildable,
else OpenCV, else the pure-numpy fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

def _find_src() -> str:
    """native/tracking_core.cpp: next to the repo checkout, or wherever
    LEGSLAM_NATIVE_DIR points (site-packages installs, containers)."""
    cands = [os.environ.get("LEGSLAM_NATIVE_DIR", "")]
    cands.append(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native"))
    cands.append(os.path.join(os.getcwd(), "native"))
    for d in cands:
        if d and os.path.exists(os.path.join(d, "tracking_core.cpp")):
            return os.path.join(d, "tracking_core.cpp")
    return os.path.join(cands[1], "tracking_core.cpp")


_SRC = _find_src()
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


# -march=native vectorizes the blended-plane KLT window loops and
# -ffast-math lets the b1/b2/a11 float reductions vectorize too (serial
# rounding order is not semantics here: KLT is an iterative approximator;
# measured drift vs the strict build is ~6e-5 px on a 640x480/300-point
# frame, while the pair shaves ~35% off the frame cost). Falls back to
# portable flags on hosts where -march=native is rejected.
_FAST_FLAGS = ["-O3", "-march=native", "-ffast-math", "-funroll-loops"]
_BASE_FLAGS = ["-O3"]


def _build(src: str, out: str) -> bool:
    # compile and link SEPARATELY: passing -ffast-math at link time pulls
    # in crtfastmath.o, whose constructor flips the process-wide FTZ/DAZ
    # bits when the .so is dlopen'd — silently changing subnormal
    # behavior for numpy/XLA in the host process. Compile-only fast
    # flags keep the vectorization without touching global FP state.
    obj = out + ".o"
    for flags in (_FAST_FLAGS, _BASE_FLAGS):
        try:
            subprocess.run(["g++", *flags, "-c", "-fPIC", "-std=c++17",
                            src, "-o", obj],
                           check=True, capture_output=True, timeout=120)
            subprocess.run(["g++", "-shared", obj, "-o", out],
                           check=True, capture_output=True, timeout=120)
            with open(out + ".flags", "w") as f:
                f.write(" ".join(flags))
            return True
        except Exception:
            continue
        finally:
            if os.path.exists(obj):
                os.remove(obj)
    return False


def _flags_stale(so: str) -> bool:
    """Rebuild when the recorded build flags lag the current fast set
    (mtime alone misses pure flag upgrades)."""
    try:
        with open(so + ".flags") as f:
            return f.read().split() != _FAST_FLAGS
    except OSError:
        return True


def load() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "libtracking_core.so")
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(_SRC) or \
                _flags_stale(so):
            if not _build(_SRC, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.st_detect.restype = ctypes.c_int
        lib.st_detect.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_float,
                                  ctypes.c_int, f32p]
        lib.klt_track.restype = None
        lib.klt_track.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                  f32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, f32p, u8p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


def detect_corners(gray: np.ndarray, max_corners: int,
                   min_distance: int = 7,
                   quality: float = 0.01) -> np.ndarray:
    """[N,2] (x, y) Shi-Tomasi corners via the native kernel."""
    lib = load()
    assert lib is not None
    g = np.ascontiguousarray(gray, np.float32)
    out = np.empty((max_corners, 2), np.float32)
    n = lib.st_detect(g, g.shape[0], g.shape[1], max_corners,
                      quality, min_distance, out)
    return out[:n].copy()


def klt_track(prev_gray: np.ndarray, cur_gray: np.ndarray,
              pts: np.ndarray, levels: int = 3, win: int = 10,
              iters: int = 30) -> tuple[np.ndarray, np.ndarray]:
    """Pyramidal LK: returns ([N,2] new points, [N] bool tracked)."""
    lib = load()
    assert lib is not None
    p = np.ascontiguousarray(prev_gray, np.float32)
    c = np.ascontiguousarray(cur_gray, np.float32)
    q = np.ascontiguousarray(pts, np.float32)
    out = np.empty_like(q)
    status = np.empty(len(q), np.uint8)
    lib.klt_track(p, c, p.shape[0], p.shape[1], q, len(q), levels, win,
                  iters, out, status)
    return out, status.astype(bool)
