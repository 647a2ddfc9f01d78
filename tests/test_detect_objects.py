"""Multi-prompt labeled detection (eval/detect_objects.py equivalents):
per-prompt heats over a frame stack, labeled per-frame bboxes, annotated
panes, and the CLI with precomputed embeddings."""
import json

import numpy as np

from legslam_tpu.eval_harness.detect_objects import (
    annotate_frame,
    detect_objects_in_frames,
    stream_rerun_detections,
)

H, W = 96, 160
FX = FY = 60.0


def _cameras(n):
    return [dict(id=i, width=W, height=H,
                 position=[float(-i), 0.0, 0.0],
                 rotation=np.eye(3).tolist(), fx=FX, fy=FY)
            for i in range(n)]


def _two_prompt_scene():
    """Prompt 0's object in frame 0 (left region), prompt 1's in frame 1
    (right region); the trained-map convention anti-aligns (+cos loss),
    so object LF = -text."""
    t0 = np.zeros(64, np.float32)
    t0[0] = 1.0
    t1 = np.zeros(64, np.float32)
    t1[1] = 1.0
    bg = np.zeros(64, np.float32)
    bg[2] = 1.0

    def render_fn(R, t, width, height, fx, fy):
        rgb = np.full((height, width, 3), 0.3, np.float32)
        lf = np.tile(bg, (height, width, 1))
        depth = np.full((height, width), 4.0, np.float32)
        idx = int(t[0])  # camera index encoded in position.x
        if idx == 0:
            lf[25:75, 20:70] = -t0
            rgb[25:75, 20:70] = 0.9
        elif idx == 1:
            lf[30:80, 90:150] = -t1
            rgb[30:80, 90:150] = 0.8
        return rgb, lf, depth

    return render_fn, np.stack([t0, t1]), ["chair", "table"]


def test_detect_multi_prompt_labeled_boxes():
    render_fn, te, prompts = _two_prompt_scene()
    res = detect_objects_in_frames(render_fn, _cameras(3), te, prompts)
    assert res.heats.shape == (2, 3, H, W)
    # frame 0: only prompt 0 fires, box around the left region
    f0 = res.frames[0].boxes
    assert list(f0.keys()) == [0]
    x0, y0, x1, y1 = f0[0][0]
    assert 10 <= x0 <= 25 and 65 <= x1 <= 80
    assert 15 <= y0 <= 30 and 70 <= y1 <= 85
    # frame 1: only prompt 1 fires, right region
    f1 = res.frames[1].boxes
    assert list(f1.keys()) == [1]
    bx0, _, bx1, _ = f1[1][0]
    assert bx0 >= 80 and bx1 >= 140
    # frame 2: nothing
    assert res.frames[2].boxes == {}
    assert res.counts() == {"chair": 1, "table": 1}


def test_annotate_frame_draws_boxes():
    render_fn, te, prompts = _two_prompt_scene()
    res = detect_objects_in_frames(render_fn, _cameras(2), te, prompts)
    bgr = annotate_frame(res.images[0], res.frames[0], prompts)
    assert bgr.shape == (H, W, 3) and bgr.dtype == np.uint8
    x0, y0, x1, y1 = res.frames[0].boxes[0][0]
    # the box edge pixels carry the prompt-0 color (pure red in BGR)
    edge = bgr[y0, x0:x1]
    assert (edge[:, 2] == 255).any() and not np.all(
        bgr[..., 2] == bgr[..., 0])


def test_stream_rerun_graceful_without_sdk():
    render_fn, te, prompts = _two_prompt_scene()
    res = detect_objects_in_frames(render_fn, _cameras(2), te, prompts)
    try:
        import rerun  # noqa: F401
        expected = True
    except ImportError:
        expected = False
    assert stream_rerun_detections(res) is expected


def _tiny_scene_dir(tmp_path):
    """On-disk trained-map layout (point_cloud/point_cloud.ply +
    cameras.json): a wall of near-opaque gaussians at z=2 with two
    rectangular patches carrying anti-aligned prompt LF."""
    import os

    from legslam_tpu.utils.ply import save_gaussian_ply

    fx = fy = 60.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    z = 2.0
    gx, gy = 64, 40
    px = np.linspace(0, W - 1, gx)
    py = np.linspace(0, H - 1, gy)
    PX, PY = np.meshgrid(px, py)
    xyz = np.stack([(PX - cx) / fx * z, (PY - cy) / fy * z,
                    np.full_like(PX, z)], -1).reshape(-1, 3)
    n = xyz.shape[0]
    lf = np.zeros((n, 64), np.float32)
    lf[:, 2] = 1.0  # background feature
    in_a = ((PX >= 20) & (PX <= 70) & (PY >= 25) & (PY <= 75)).reshape(-1)
    in_b = ((PX >= 95) & (PX <= 150) & (PY >= 20) & (PY <= 80)).reshape(-1)
    lf[in_a] = 0.0
    lf[in_a, 0] = -1.0  # anti-aligned with prompt 0 (+cos loss convention)
    lf[in_b] = 0.0
    lf[in_b, 1] = -1.0
    f_dc = np.full((n, 1, 3), 0.5, np.float32)
    f_rest = np.zeros((n, 15, 3), np.float32)
    opacity = np.full((n, 1), 4.0, np.float32)          # sigmoid ~0.98
    scaling = np.full((n, 3), np.log(0.06), np.float32)
    rotation = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))

    scene = tmp_path / "experiment" / "ply"
    os.makedirs(scene / "point_cloud")
    save_gaussian_ply(str(scene / "point_cloud" / "point_cloud.ply"),
                      xyz, f_dc, f_rest, lf, opacity, scaling, rotation)
    cams = []
    for i in range(2):
        cams.append(dict(id=i, width=W, height=H,
                         position=[0.02 * i, 0.0, 0.0],
                         rotation=np.eye(3).tolist(), fx=fx, fy=fy))
    (scene / "cameras.json").write_text(json.dumps(cams))
    return scene


def test_detect_objects_cli(tmp_path):
    """CLI e2e over an on-disk trained-map layout with precomputed
    embeddings (the --text-embs route; --prompts/--weights is covered by
    the talk2dino pipeline tests)."""
    from legslam_tpu.apps import detect_objects as app

    scene = _tiny_scene_dir(tmp_path)
    embs = np.zeros((2, 64), np.float32)
    embs[0, 0] = 1.0
    embs[1, 1] = 1.0
    emb_path = tmp_path / "q.npy"
    np.save(emb_path, embs)
    out = tmp_path / "det"
    app.main(["--scene", str(scene),
              "--text-embs", str(emb_path),
              "--prompts", "chair", "table",
              "--threshold", "0.6", "--no-pamr",
              "--out", str(out), "--video"])
    det = json.loads((out / "detections.json").read_text())
    assert det["prompts"] == ["chair", "table"]
    assert len(det["frames"]) == 2
    # both prompts detected somewhere in the stack, with labeled boxes
    assert det["counts"]["chair"] >= 1 and det["counts"]["table"] >= 1
    assert (out / "detections.mp4").exists()
