"""Open-vocabulary object finding + orbit rendering (C24).

Parity references:
  - pixel-space: render training cams, per-pixel cosine sim vs text,
    min-max inversion, box-filter + threshold masks (find_bboxes,
    eval/find_objects.py:198-227,302-310), best-frame selection,
    depth-weighted 3D center (compute_3d_center, :36-108),
    fibonacci-sphere viewpoints (:110-137).
  - gaussian-space: per-gaussian cosine sim, threshold 0.94, DBSCAN
    (eps=0.16, min_samples=5) cluster centers, orbit cameras
    (eval/render_object.py:85-120, eval/find_objects_gaussians.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

PIXEL_MASK_THRESHOLD = 0.5     # eval/find_objects.py:310
BOX_FILTER = 30                # 30x30 smoothing (find_bboxes)
GAUSSIAN_SIM_THRESHOLD = 0.94  # eval/render_object.py:55
DBSCAN_EPS = 0.16
DBSCAN_MIN_SAMPLES = 5


def inverted_similarity(lf: np.ndarray, text_emb: np.ndarray) -> np.ndarray:
    """1 - minmax(cos) per text row (the eval-side inversion; see
    SURVEY.md §3.3)."""
    lfn = lf / np.linalg.norm(lf, axis=-1, keepdims=True).clip(1e-12)
    te = text_emb / np.linalg.norm(text_emb, axis=-1, keepdims=True) \
        .clip(1e-12)
    sim = np.einsum("...c,nc->n...", lfn, te)
    flat = sim.reshape(sim.shape[0], -1)
    lo = flat.min(-1).reshape((-1,) + (1,) * (sim.ndim - 1))
    hi = flat.max(-1).reshape((-1,) + (1,) * (sim.ndim - 1))
    return 1.0 - (sim - lo) / np.maximum(hi - lo, 1e-12)


def box_filter(img: np.ndarray, k: int = BOX_FILTER) -> np.ndarray:
    """Mean filter via integral image (the reference uses a 30x30 box)."""
    pad = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.float64)
    pad[1:, 1:] = np.cumsum(np.cumsum(img, 0), 1)
    h, w = img.shape
    r = k // 2
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - r, 0, h)
    y1 = np.clip(ys + r + 1, 0, h)
    x0 = np.clip(xs - r, 0, w)
    x1 = np.clip(xs + r + 1, 0, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = pad[y1][:, x1] - pad[y1][:, x0] - pad[y0][:, x1] + pad[y0][:, x0]
    return (s / area).astype(np.float32)


def find_masks(heat: np.ndarray,
               threshold: float = PIXEL_MASK_THRESHOLD) -> np.ndarray:
    """Smoothed-heatmap threshold mask (find_bboxes,
    eval/find_objects.py:198-227)."""
    return box_filter(heat) > threshold


def compute_3d_center(heat: np.ndarray, depth: np.ndarray,
                      view_R: np.ndarray, view_t: np.ndarray,
                      fx: float, fy: float, cx: float, cy: float,
                      threshold: float = PIXEL_MASK_THRESHOLD
                      ) -> Optional[np.ndarray]:
    """Similarity-weighted back-projected center of the masked region
    (compute_3d_center, eval/find_objects.py:36-108)."""
    mask = find_masks(heat, threshold) & (depth > 0)
    if not mask.any():
        return None
    ys, xs = np.nonzero(mask)
    w = heat[ys, xs]
    d = depth[ys, xs]
    cam = np.stack([(xs - cx) / fx * d, (ys - cy) / fy * d, d], -1)
    world = (cam - view_t) @ view_R
    return (world * w[:, None]).sum(0) / max(w.sum(), 1e-12)


def fibonacci_sphere_viewpoints(center: np.ndarray, radius: float,
                                n: int = 32) -> np.ndarray:
    """[n, 3] camera positions on a fibonacci sphere around the object
    (eval/find_objects.py:110-137)."""
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(1.0 - y * y)
    theta = phi * i
    dirs = np.stack([r * np.cos(theta), y, r * np.sin(theta)], -1)
    return center[None] + radius * dirs


def orbit_trajectory(center: np.ndarray, radius: float,
                     n: int = 120, height: float = 0.0) -> list:
    """Azimuthal orbit poses looking at the center
    (eval/render_object.py:95-127; the reference samples 1000 azimuth
    steps). Returns list of (R, t) world->camera."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        eye = center + np.array([radius * np.cos(a), height,
                                 radius * np.sin(a)])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
        w2c = np.linalg.inv(c2w)
        poses.append((w2c[:3, :3].astype(np.float32),
                      w2c[:3, 3].astype(np.float32)))
    return poses


@dataclasses.dataclass
class ObjectDetection:
    center: np.ndarray
    n_gaussians: int
    score: float


def find_objects_in_gaussians(xyz: np.ndarray, lang_feat: np.ndarray,
                              text_emb: np.ndarray,
                              sim_threshold: float = GAUSSIAN_SIM_THRESHOLD,
                              eps: float = DBSCAN_EPS,
                              min_samples: int = DBSCAN_MIN_SAMPLES
                              ) -> list[ObjectDetection]:
    """Gaussian-space object finding (eval/find_objects_gaussians.py):
    inverted per-gaussian similarity > threshold -> DBSCAN clusters ->
    centers."""
    heat = inverted_similarity(lang_feat, text_emb[None])[0]
    sel = heat > sim_threshold
    if sel.sum() < min_samples:
        return []
    pts = xyz[sel]
    scores = heat[sel]
    try:
        from sklearn.cluster import DBSCAN
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit(pts).labels_
    except ImportError:  # pragma: no cover
        labels = np.zeros(len(pts), np.int64)
    out = []
    for lbl in sorted(set(labels) - {-1}):
        m = labels == lbl
        out.append(ObjectDetection(
            center=pts[m].mean(0), n_gaussians=int(m.sum()),
            score=float(scores[m].mean())))
    out.sort(key=lambda d: -d.n_gaussians)
    return out
