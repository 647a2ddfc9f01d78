"""Native C++ tracking kernels (native/tracking_core.cpp via ctypes):
build, correctness on synthetic motion, and agreement with OpenCV."""
import numpy as np
import pytest

from legslam_tpu.slam import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ / native build unavailable")

H, W = 120, 160


def _scene(rng):
    """Textured float image with strong corners."""
    img = rng.uniform(0.2, 0.4, size=(H, W)).astype(np.float32)
    for (y, x) in [(30, 40), (30, 110), (80, 40), (80, 110), (55, 75)]:
        img[y:y + 14, x:x + 14] += 0.5
    return np.clip(img, 0, 1)


def test_detect_finds_block_corners():
    rng = np.random.default_rng(0)
    img = _scene(rng)
    pts = native.detect_corners(img, 64, min_distance=5)
    assert len(pts) >= 10
    # every injected block contributes at least one corner near its borders
    blocks = [(30, 40), (30, 110), (80, 40), (80, 110), (55, 75)]
    for (by, bx) in blocks:
        corners = np.array([[bx, by], [bx + 13, by], [bx, by + 13],
                            [bx + 13, by + 13]], np.float32)
        d = np.linalg.norm(pts[:, None] - corners[None], axis=-1).min()
        assert d < 3.0, (by, bx, d)


def test_min_distance_respected():
    rng = np.random.default_rng(1)
    img = _scene(rng)
    pts = native.detect_corners(img, 64, min_distance=9)
    if len(pts) >= 2:
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        d += np.eye(len(pts)) * 1e9
        assert d.min() >= 9.0 - 1e-3


def test_klt_recovers_translation():
    rng = np.random.default_rng(2)
    img = _scene(rng)
    dx, dy = 3.0, -2.0
    # shift by integer + subpixel via roll on a 2x upsampled grid
    shifted = np.roll(np.roll(img, int(dy), axis=0), int(dx), axis=1)
    pts = native.detect_corners(img, 32, min_distance=5)
    pts = pts[(pts[:, 0] > 15) & (pts[:, 0] < W - 15) &
              (pts[:, 1] > 15) & (pts[:, 1] < H - 15)]
    nxt, ok = native.klt_track(img, shifted, pts)
    assert ok.sum() >= 0.8 * len(pts)
    flow = nxt[ok] - pts[ok]
    np.testing.assert_allclose(np.median(flow, 0), [dx, dy], atol=0.35)


def test_agreement_with_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    img = _scene(rng)
    g8 = (img * 255).astype(np.uint8)
    shifted = np.roll(img, 2, axis=1)
    s8 = (shifted * 255).astype(np.uint8)

    pts = native.detect_corners(img, 32, min_distance=7)
    cv_pts = cv2.goodFeaturesToTrack(g8, 32, 0.01, 7).reshape(-1, 2)
    # most native corners sit within 2px of a cv2 corner
    d = np.linalg.norm(pts[:, None] - cv_pts[None], axis=-1).min(1)
    assert (d < 2.0).mean() > 0.6, d

    sel = pts[(pts[:, 0] > 15) & (pts[:, 0] < W - 15) &
              (pts[:, 1] > 15) & (pts[:, 1] < H - 15)]
    ours, ok = native.klt_track(img, shifted, sel)
    cv_nxt, st, _ = cv2.calcOpticalFlowPyrLK(
        g8, s8, sel.reshape(-1, 1, 2).astype(np.float32), None,
        winSize=(21, 21), maxLevel=3)
    cv_nxt = cv_nxt.reshape(-1, 2)
    both = ok & st.reshape(-1).astype(bool)
    assert both.sum() >= 5
    np.testing.assert_allclose(ours[both], cv_nxt[both], atol=0.75)


def test_frontend_runs_on_native_backend(monkeypatch):
    """The full TrackingFrontend works with LEGSLAM_NATIVE_TRACKING=1."""
    monkeypatch.setenv("LEGSLAM_NATIVE_TRACKING", "1")
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.slam.tracking import TrackingFrontend

    ds = SyntheticDataset(n_frames=6, width=160, height=96,
                          n_gaussians=1200, seed=2, clutter_ratio=0.0)
    fe = TrackingFrontend(ds.intrinsics, max_corners=300)
    for frame in ds:
        f = frame if frame.index == 0 else \
            type(frame)(index=frame.index, timestamp=frame.timestamp,
                        color=frame.color, depth=frame.depth, c2w=None)
        fe.track(f)
    assert fe.num_keyframes >= 1
    est, _ = fe.trajectory()
    assert np.isfinite(est).all()
