"""Undistortion pipeline (C15: include/camera.h:68-110 equivalents):
map parity vs OpenCV, valid-mask shape, mapper ingestion, and the
loss-masking property (masked loss ignores whatever lands in the invalid
border region)."""
import numpy as np
import pytest

from legslam_tpu.ops import losses
from legslam_tpu.utils.undistort import (
    Undistortion,
    build_undistortion,
    remap_bilinear,
    undistort_rectify_map,
)

W, H = 160, 120
K = np.array([[120.0, 0, 79.5], [0, 120.0, 59.5], [0, 0, 1]], np.float64)
DIST = (0.25, -0.05, 0.001, -0.002)  # TUM-ish radial-tangential


def test_identity_when_undistorted():
    mx, my = undistort_rectify_map(K, (0, 0, 0, 0), K, W, H)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)
    img = np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    np.testing.assert_allclose(remap_bilinear(img, mx, my), img, atol=1e-5)


def test_map_and_remap_match_opencv():
    cv2 = pytest.importorskip("cv2")
    mx, my = undistort_rectify_map(K, DIST, K, W, H)
    cm1, cm2 = cv2.initUndistortRectifyMap(
        K.astype(np.float32), np.asarray(DIST, np.float32),
        np.eye(3, dtype=np.float32), K.astype(np.float32), (W, H),
        cv2.CV_32FC1)
    np.testing.assert_allclose(mx, cm1, atol=1e-3)
    np.testing.assert_allclose(my, cm2, atol=1e-3)

    img = np.random.default_rng(1).uniform(size=(H, W, 3)).astype(np.float32)
    ours = remap_bilinear(img, mx, my)
    ref = cv2.remap(img, cm1, cm2, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT)
    # interior parity (cv2 clamps the last-row/col taps slightly differently)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-4)


def test_valid_mask_kills_border():
    intr = dict(width=W, height=H, fx=K[0, 0], fy=K[1, 1], cx=K[0, 2],
                cy=K[1, 2], dist_coeffs=DIST)
    und = build_undistortion(intr)
    assert und is not None
    # barrel distortion pulls corners outside the source image
    assert und.valid_mask[0, 0] < 0.5
    assert und.valid_mask[-1, -1] < 0.5
    assert und.valid_mask[H // 2, W // 2] == pytest.approx(1.0, abs=1e-5)
    # no distortion -> no machinery
    assert build_undistortion(dict(width=W, height=H, fx=1, fy=1, cx=0,
                                   cy=0)) is None
    assert build_undistortion(dict(width=W, height=H, fx=1, fy=1, cx=0,
                                   cy=0, dist_coeffs=(0, 0, 0, 0))) is None


def test_mapper_ingests_undistorted_keyframes():
    from legslam_tpu.mapper.mapper import GaussianMapper
    from legslam_tpu.slam.interface import KeyframePacket, OperationQueue

    intr = dict(width=W, height=H, fx=K[0, 0], fy=K[1, 1], cx=K[0, 2],
                cy=K[1, 2], dist_coeffs=DIST)
    q = OperationQueue()
    mapper = GaussianMapper(q, intr, capacity=1 << 10)
    rng = np.random.default_rng(2)
    color = rng.uniform(0.2, 0.8, size=(H, W, 3)).astype(np.float32)
    # garbage in the raw border (sensor vignetting / invalid rows)
    color[:3] = 7.0
    color[:, :3] = -7.0
    depth = np.full((H, W), 2.0, np.float32)
    pkt = KeyframePacket(fid=0, timestamp=0.0, R=np.eye(3, dtype=np.float32),
                         t=np.zeros(3, np.float32), color=color, depth=depth,
                         lf_image=None)
    mapper._ingest_keyframe(pkt)
    kf = mapper.keyframes[0]
    m = np.asarray(kf.mask[-1])
    gt = np.asarray(kf.gt_color[-1])
    assert m[0, 0] < 0.5 and m[H // 2, W // 2] > 0.99
    # invalid corners of the undistorted GT are border-constant zero
    assert abs(gt[0, 0]).max() < 1.5  # garbage (7.0) never survives verbatim
    # original packet sizes preserved
    assert gt.shape == (H, W, 3)


def test_masked_loss_ignores_invalid_region():
    rng = np.random.default_rng(3)
    gt = rng.uniform(size=(H, W, 3)).astype(np.float32)
    depth_gt = rng.uniform(1, 3, size=(H, W)).astype(np.float32)
    mask = np.ones((H, W), np.float32)
    mask[:10] = 0.0
    gt = gt * mask[..., None]          # undistorted GT is zero where invalid
    depth_gt = depth_gt * mask

    render_a = rng.uniform(size=(H, W, 3)).astype(np.float32)
    render_b = render_a.copy()
    render_b[:10] = 123.0              # garbage only in the masked band
    depth_r = rng.uniform(1, 3, size=(H, W)).astype(np.float32)
    la = losses.mapping_loss(render_a, gt, None, None, depth_r, depth_gt,
                             mask, 0.2)
    lb = losses.mapping_loss(render_b, gt, None, None, depth_r, depth_gt,
                             mask, 0.2)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
