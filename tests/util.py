"""Shared test helpers: random scenes and cameras."""
import numpy as np

from legslam_tpu.utils.camera import CameraView


def random_scene(rng, n, capacity=None, lf_dim=8, sh_k=16, spread=1.0,
                 center=(0.0, 0.0, 4.0)):
    """Random gaussian cloud in front of a canonical camera at origin."""
    capacity = capacity or n
    means = rng.normal(size=(capacity, 3)).astype(np.float32) * spread
    means += np.asarray(center, np.float32)
    sh = rng.normal(size=(capacity, sh_k, 3)).astype(np.float32) * 0.3
    sh[:, 0] += 0.8
    lf = rng.normal(size=(capacity, lf_dim)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.95, size=(capacity,)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2.0, size=(capacity, 3))).astype(
        np.float32)
    quats = rng.normal(size=(capacity, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    valid = np.zeros((capacity,), bool)
    valid[:n] = True
    return dict(means3d=means, sh=sh, lang_feat=lf, opacity=opacity,
                scales=scales, quats=quats, valid=valid)


def simple_view(width=160, height=96, fx=120.0, fy=120.0):
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, dtype=np.float32)
    return CameraView.create(R, t, width, height, fx=fx, fy=fy)
