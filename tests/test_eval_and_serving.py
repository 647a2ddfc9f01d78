"""Metrics, find_objects, and the serving API (stdlib server)."""
import json
import threading
import urllib.request

import numpy as np

from legslam_tpu.eval_harness import find_objects as FO
from legslam_tpu.eval_harness import metrics as M


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(50, 3))
    R_true, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R_true) < 0:
        R_true[:, 0] *= -1
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * (R_true @ src.T).T + t_true
    out = M.ate_rmse(src, dst)
    assert out["rmse"] < 1e-6
    np.testing.assert_allclose(out["scale"], s_true, rtol=1e-6)


def test_depth_l1():
    gt = np.ones((4, 4)) * 2.0
    pred = gt + 0.01
    assert abs(M.depth_l1_cm(pred, gt) - 1.0) < 1e-6
    gt[0, 0] = 0.0  # invalid pixel excluded
    assert abs(M.depth_l1_cm(pred, gt) - 1.0) < 1e-6


def test_confusion_miou():
    gt = np.array([[1, 1, 2, 2]])
    pred = np.array([[1, 2, 2, 2]])
    conf = M.confusion_matrix(pred, gt, 3)
    scores = M.miou_from_confusion(conf, ignore=(0,))
    # class1: inter 1, union 2 -> 0.5 ; class2: inter 2, union 3
    np.testing.assert_allclose(scores["miou"], (0.5 + 2 / 3) / 2)


def test_segment_prediction_reject(rng):
    text = np.eye(3, 8, dtype=np.float32)
    lf = np.zeros((2, 2, 8), np.float32)
    lf[0, 0] = -text[1]   # cos=-1 vs class1 -> score 1.0 -> label 2
    lf[1, 1] = text[0]    # cos=+1 vs class0 -> scores <= 0.5 -> reject
    labels = M.segment_prediction(lf, text, reject_threshold=0.7)
    assert labels[0, 0] == 2
    assert labels[1, 1] == 0


def test_box_filter_matches_naive(rng):
    img = rng.uniform(size=(20, 25)).astype(np.float32)
    out = FO.box_filter(img, k=5)
    # naive check at a few pixels
    for (y, x) in [(0, 0), (10, 12), (19, 24)]:
        y0, y1 = max(0, y - 2), min(20, y + 3)
        x0, x1 = max(0, x - 2), min(25, x + 3)
        np.testing.assert_allclose(out[y, x], img[y0:y1, x0:x1].mean(),
                                   rtol=1e-5)


def test_find_objects_in_gaussians(rng):
    # two clusters with distinctive language features
    target = np.zeros(16, np.float32)
    target[0] = 1.0
    xyz = np.concatenate([
        rng.normal(scale=0.02, size=(50, 3)) + [1, 0, 0],
        rng.normal(scale=0.02, size=(40, 3)) + [-1, 0, 0],
        rng.normal(scale=2.0, size=(400, 3))]).astype(np.float32)
    lf = rng.normal(size=(490, 16)).astype(np.float32)
    lf[:90] = -target * 5  # anti-aligned => inverted similarity ~ 1
    dets = FO.find_objects_in_gaussians(
        xyz, lf, target, sim_threshold=0.9, eps=0.3)
    assert len(dets) >= 2
    centers = np.array([d.center for d in dets[:2]])
    assert min(np.abs(centers[:, 0] - 1).min(),
               np.abs(centers[:, 0] + 1).min()) < 0.1


def test_fibonacci_and_orbit():
    pts = FO.fibonacci_sphere_viewpoints(np.zeros(3), 2.0, n=16)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 2.0, rtol=1e-6)
    poses = FO.orbit_trajectory(np.array([1.0, 0, 0]), 1.5, n=8)
    assert len(poses) == 8
    for R, t in poses:
        c = -(R.T @ t)  # camera center on the orbit
        np.testing.assert_allclose(np.linalg.norm(c - [1.0, 0, 0]), 1.5,
                                   rtol=1e-5)


def test_stdlib_api(tmp_path, rng):
    from legslam_tpu.serving import api
    from legslam_tpu.utils import ply

    n = 60
    target = np.zeros(64, np.float32)
    target[0] = 1.0
    lf = rng.normal(size=(n, 64)).astype(np.float32)
    lf[:20] = -target * 5
    xyz = np.concatenate([
        rng.normal(scale=0.02, size=(20, 3)) + [1, 0, 0],
        rng.normal(scale=1.0, size=(40, 3))]).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    ply.save_gaussian_ply(
        p, xyz, np.zeros((n, 1, 3), np.float32),
        np.zeros((n, 15, 3), np.float32), lf,
        np.zeros((n, 1), np.float32), np.zeros((n, 3), np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))

    state = api.ServiceState(
        ply_path=p, text_encoder=lambda qs: target[None].repeat(len(qs), 0))
    server = api.serve_stdlib(state, host="127.0.0.1", port=18731)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:18731/health", timeout=5) as r:
            assert json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            "http://127.0.0.1:18731/find_objects",
            data=json.dumps({"query": "a red chair"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            body = json.load(r)
        assert body["query"] == "a red chair"
        assert len(body["objects"]) >= 1
        c = body["objects"][0]["center"]
        assert abs(c[0] - 1.0) < 0.2
    finally:
        server.shutdown()


def test_scannet_segmentation_scoring(rng):
    """End-to-end mIoU scoring path with synthetic GT labels."""
    from legslam_tpu.eval_harness.scannet_eval import evaluate_segmentation

    class FakeView:
        width, height = 64, 32

    class FakeKF:
        def __init__(self):
            self.R = np.eye(3, dtype=np.float32)
            self.t = np.zeros(3, np.float32)
            self.views = [FakeView()]

    text = np.eye(3, 64, dtype=np.float32)  # 3 classes

    class FakeOut:
        def __init__(self, lf):
            self.lang_feat = lf

    class FakeMapper:
        keyframes = {0: FakeKF(), 1: FakeKF()}

        def render_from_pose(self, R, t, w, h, include_lang_feat=True):
            lf = np.zeros((h, w, 64), np.float32)
            lf[:, : w // 2] = -text[0] * 5   # class 1 on the left
            lf[:, w // 2:] = -text[1] * 5    # class 2 on the right
            return FakeOut(lf)

    def gt_loader(fid):
        gt = np.zeros((32, 64), np.int64)
        gt[:, :32] = 1
        gt[:, 32:] = 2
        return gt

    scores = evaluate_segmentation(FakeMapper(), text, gt_loader,
                                   frame_ids=[0, 1], num_classes=4,
                                   every_nth=1)
    assert scores["miou"] > 0.95, scores["miou"]
