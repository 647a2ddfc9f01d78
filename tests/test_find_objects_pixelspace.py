"""Pixel-space find_objects pipeline (eval/find_objects.py:229-434
equivalents): bbox masks, best-frame selection, 3D center, viewpoint
filtering, and the all-cams driver with a synthetic render function."""
import numpy as np

from legslam_tpu.eval_harness.find_objects import (
    compute_3d_center,
    fibonacci_sphere_viewpoints,
    find_bboxes,
    find_masks,
    global_inverted_similarity,
    is_valid_viewpoint,
    pixel_space_find_object,
    select_best_frame,
)

H, W = 96, 160
FX = FY = 60.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5


def _blob_heat(y0, y1, x0, x1, shape=(H, W)):
    heat = np.zeros(shape, np.float32)
    heat[y0:y1, x0:x1] = 1.0
    return heat


def test_find_bboxes_blob():
    heat = _blob_heat(20, 70, 40, 100)
    boxes, mask = find_bboxes(heat)
    assert len(boxes) == 1
    x0, y0, x1, y1 = boxes[0]
    # combined 0.5*(box_avg + raw) > 0.5 keeps the blob interior
    assert x0 >= 35 and x1 <= 105 and y0 >= 15 and y1 <= 75
    assert mask[45, 70]
    assert not mask[5, 5]
    # sub-20px blobs are filtered like the reference (find_objects.py:224)
    small, _ = find_bboxes(_blob_heat(10, 25, 10, 25))
    assert small == []


def test_select_best_frame_prefers_larger_area():
    heats = np.stack([
        _blob_heat(30, 60, 30, 60),       # 30x30 blob
        _blob_heat(20, 80, 30, 120),      # much larger blob
        np.zeros((H, W), np.float32),
    ])
    best, mask = select_best_frame(heats)
    assert best == 1
    assert mask is not None and mask.sum() > 1000


def test_compute_3d_center_identity_pose():
    heat = _blob_heat(40, 60, 70, 100)
    depth = np.full((H, W), 2.0, np.float32)
    center = compute_3d_center(heat, depth, np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32), FX, FY, CX, CY)
    assert center is not None
    ys, xs = np.nonzero(find_masks(heat) & (depth > 0))
    exp = np.stack([(xs - CX) / FX * 2.0, (ys - CY) / FY * 2.0,
                    np.full_like(xs, 2.0, np.float64)], -1).mean(0)
    np.testing.assert_allclose(center, exp, atol=1e-5)


def test_viewpoint_validity_filter():
    target = np.zeros(3)
    pts = np.array([[0.5, 0.0, 0.0]], np.float32)
    assert is_valid_viewpoint(np.array([2.0, 0, 0]), target, pts)
    # too far from target
    assert not is_valid_viewpoint(np.array([20.0, 0, 0]), target, pts)
    # inside scene geometry
    assert not is_valid_viewpoint(np.array([0.55, 0, 0]), target, pts,
                                  min_distance=0.1)


def test_fibonacci_endpoints():
    vp = fibonacci_sphere_viewpoints(np.zeros(3), 2.0, n=16)
    assert vp.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(vp, axis=1), 2.0, atol=1e-6)
    # endpoint formulation: first/last points at the poles (y=+-r)
    np.testing.assert_allclose(vp[0], [0, 2.0, 0], atol=1e-6)
    np.testing.assert_allclose(vp[-1], [0, -2.0, 0], atol=1e-6)


def test_pixel_space_driver_end_to_end():
    """Fake scene: an 'object' patch carrying -text LF (the trained-map
    convention: the +cos loss anti-aligns) in frame 1 only; the driver must
    pick frame 1, back-project the center, and emit valid viewpoints."""
    text = np.zeros(64, np.float32)
    text[0] = 1.0
    other = np.zeros(64, np.float32)
    other[1] = 1.0

    obj_y, obj_x = slice(30, 70), slice(60, 120)
    obj_depth = 2.0

    def render_fn(R, t, width, height, fx, fy):
        rgb = np.full((height, width, 3), 0.3, np.float32)
        lf = np.tile(other, (height, width, 1))
        depth = np.full((height, width), 4.0, np.float32)
        # the object is only visible from camera index stored in t[0]
        if int(t[0]) == 1:
            lf[obj_y, obj_x] = -text
            depth[obj_y, obj_x] = obj_depth
            rgb[obj_y, obj_x] = 0.9
        return rgb, lf, depth

    cameras = []
    for i in range(3):
        cameras.append(dict(id=i, width=W, height=H,
                            position=[float(-i), 0.0, 0.0],
                            rotation=np.eye(3).tolist(), fx=FX, fy=FY))
    # encode the camera index in position.x so render_fn can detect it:
    # w2c t = -R^T @ position = [-(-i), 0, 0] = [i, 0, 0]
    res = pixel_space_find_object(render_fn, cameras, text,
                                  scene_points=np.zeros((0, 3), np.float32),
                                  n_views=12, radius=1.5)
    assert res.best_frame == 1
    assert res.center is not None
    # identity rotation, camera at (-1,0,0): world = cam + position
    assert abs(res.center[2] - obj_depth) < 0.3
    assert len(res.viewpoints) > 0
    for p in res.viewpoints:
        assert np.linalg.norm(p - res.center) <= 10.0
    # heats are globally normalized: the object region is the hottest
    assert res.heats[1][45, 90] > 0.9
    assert res.heats[0].max() < 0.8


def test_global_inversion():
    cos = np.stack([np.full((4, 4), -1.0), np.zeros((4, 4))])
    inv = global_inverted_similarity(cos)
    assert inv.max() == 1.0 and inv.min() == 0.0
    assert inv[0].min() == 1.0  # most-negative cos -> hottest


def test_stream_rerun_graceful_without_sdk():
    """stream_rerun no-ops (returns False) when the rerun SDK is missing —
    the offline image ships without it (eval/find_objects.py:404-434)."""
    import numpy as np

    from legslam_tpu.eval_harness import find_objects as F

    res = F.PixelSpaceResult(
        best_frame=0, center=np.zeros(3),
        heats=np.random.rand(2, 8, 8).astype(np.float32),
        best_mask=np.ones((8, 8), bool),
        images=np.random.rand(2, 8, 8, 3).astype(np.float32),
        depths=np.ones((2, 8, 8), np.float32),
        viewpoints=np.zeros((0, 3), np.float32))
    try:
        import rerun  # noqa: F401
        expected = True
    except ImportError:
        expected = False
    assert F.stream_rerun(res, scene_points=np.zeros((4, 3))) is expected
