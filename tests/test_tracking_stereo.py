"""Stereo visual tracking: TrackingFrontend(sensor='stereo') recovers
depth from census+SGM on synthetic rectified pairs and tracks with the
RGB-D machinery (System::TrackStereo; depth never provided by the
dataset). Packets carry color_right for the mapper's SGM densify branch
(gaussian_mapper.cpp:1302)."""
import dataclasses

import numpy as np
import pytest

from legslam_tpu.data.synthetic import SyntheticDataset
from legslam_tpu.slam.tracking import TrackingFrontend

# sized so fx*b/z lands at ~13-26 px on the synthetic scene (z ~ 4-8,
# fx = 204.8) — inside the SGM search window [min_disp=8, num_disp=128),
# like EuRoC's fx=458/b=0.11 at room depths
BASELINE = 0.5


def _right_view(color, depth, fx):
    """Inverse-warp a rectified right view: right(u) = left(u + fx*b/z).
    Uses the left depth as the sampling proxy — accurate enough on the
    smooth synthetic scene for SGM to recover coarse disparity."""
    h, w, _ = color.shape
    us = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    z = np.where(depth > 1e-3, depth, 1e6)
    disp = fx * BASELINE / z
    src = np.clip(us + disp, 0, w - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, w - 1)
    f = (src - lo)[..., None]
    rows = np.arange(h)[:, None]
    return (color[rows, lo] * (1 - f) + color[rows, hi] * f).astype(
        np.float32)


@pytest.fixture(scope="module")
def stereo_seq():
    ds = SyntheticDataset(n_frames=10, width=256, height=144,
                          n_gaussians=7000, revolutions=0.15, seed=11,
                          clutter_ratio=0.0)
    frames = []
    for fr in ds:
        right = _right_view(fr.color, fr.depth, ds.intrinsics["fx"])
        frames.append((dataclasses.replace(fr, depth=None), right, fr.c2w))
    return ds, frames


def test_stereo_tracking_bounded_ate(stereo_seq):
    ds, frames = stereo_seq
    fe = TrackingFrontend(ds.intrinsics, sensor="stereo",
                          stereo_baseline=BASELINE, max_corners=300,
                          kf_trans_th=0.05, kf_rot_deg_th=5.0)
    for fr, right, _ in frames:
        assert fr.depth is None
        fe.track(fr, color_right=right)
    assert fe.n_keyframes_created >= 2
    # packets carry the right image for the SGM densify branch
    pkt_rights = []
    while True:
        op = fe.queue.pop_operation()
        if op is None:
            break
        pkt_rights.extend(kf.color_right for kf in op.keyframes)
    assert any(r is not None for r in pkt_rights)
    # trajectory error vs GT, aligned at the first frame (stereo gives
    # metric scale, so no scale alignment): SGM-quantized depth bounds
    # accuracy — assert the drift stays well under the trajectory span
    errs = []
    T0_est = fe.poses[0]
    T0_gt = frames[0][2]
    for fid, est in fe.poses.items():
        gt = frames[fid][2]
        rel_est = np.linalg.inv(T0_est) @ est
        rel_gt = np.linalg.inv(T0_gt) @ gt
        errs.append(np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3]))
    span = np.linalg.norm(frames[-1][2][:3, 3] - frames[0][2][:3, 3])
    assert np.median(errs) < max(0.5 * span, 0.15), (
        np.median(errs), span)


def test_stereo_requires_right_image(stereo_seq):
    ds, frames = stereo_seq
    fe = TrackingFrontend(ds.intrinsics, sensor="stereo",
                          stereo_baseline=BASELINE)
    with pytest.raises(ValueError, match="color_right"):
        fe.track(frames[0][0])
