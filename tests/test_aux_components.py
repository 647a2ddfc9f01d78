"""Checkpoint/resume, stereo ops, .sens reader, autoencoder, config, viewer."""
import os
import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legslam_tpu.mapper import checkpoint as CK
from legslam_tpu.models import gaussians as G
from legslam_tpu.ops import stereo


def _make_state(rng, n=10, cap=16):
    st = G.create_from_pcd(rng.normal(size=(n, 3)).astype(np.float32),
                           rng.uniform(size=(n, 3)).astype(np.float32),
                           capacity=cap)
    # nonzero moments so the roundtrip is meaningful
    g = jax.tree.map(lambda x: jnp.asarray(
        rng.normal(size=x.shape).astype(np.float32)), st.params)
    return G.adam_update(st, g, dict(
        xyz=1e-3, f_dc=1e-3, f_rest=1e-4, lang_feat=1e-3, opacity=1e-2,
        scaling=1e-3, rotation=1e-3))


def test_checkpoint_roundtrip(tmp_path, rng):
    st = _make_state(rng)
    path = str(tmp_path / "ck.npz")
    CK.save_checkpoint(path, st, meta=dict(iteration=42))
    st2, meta = CK.load_checkpoint(path)
    assert meta["iteration"] == 42
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_from_ply(tmp_path, rng):
    from legslam_tpu.utils import ply
    st = _make_state(rng)
    valid = np.asarray(st.valid)
    p = str(tmp_path / "pc.ply")
    pr = st.params
    ply.save_gaussian_ply(p, *(np.asarray(getattr(pr, f))[valid] for f in
                               ("xyz", "f_dc", "f_rest", "lang_feat",
                                "opacity", "scaling", "rotation")))
    st2 = CK.state_from_ply(p, capacity=16)
    np.testing.assert_allclose(np.asarray(st2.params.xyz[:10]),
                               np.asarray(st.params.xyz[:10]))
    assert int(st2.num_valid()) == 10
    assert float(jnp.abs(st2.adam_m.xyz).sum()) == 0.0


def test_mono_borrow_depth():
    px = jnp.asarray([[10., 10.], [12., 10.], [100., 100.], [300., 5.]])
    d = jnp.asarray([2.0, 0.0, 3.0, 0.0])
    has = d > 0
    pts, ok = stereo.mono_borrow_depth(px, d, has, max_pixel_dist=20.0,
                                       fx=100., fy=100., cx=50., cy=50.)
    assert bool(ok[1]) and not bool(ok[3])  # 1 borrows from 0; 3 too far
    np.testing.assert_allclose(float(pts[1, 2]), 2.0)
    np.testing.assert_allclose(float(pts[3, 2]), -1.0)
    # borrower reprojects with ITS OWN pixel
    np.testing.assert_allclose(float(pts[1, 0]), (12 - 50) / 100 * 2.0)


def test_sens_roundtrip(tmp_path, rng):
    import cv2
    from legslam_tpu.data.scannet_sens import SensReader, extract
    # build a tiny synthetic v4 .sens file
    h, w = 8, 12
    depth = (rng.integers(100, 5000, (h, w))).astype(np.uint16)
    color = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", color)
    pose = np.eye(4, dtype=np.float32)
    path = str(tmp_path / "scene.sens")
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"synthetic"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack("i", 2))   # jpeg color
        f.write(struct.pack("i", 1))   # zlib_ushort depth
        f.write(struct.pack("II", w, h))
        f.write(struct.pack("II", w, h))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", 2))
        for i in range(2):
            f.write(pose.tobytes())
            f.write(struct.pack("QQ", i, i))
            dz = zlib.compress(depth.tobytes())
            f.write(struct.pack("QQ", len(jpg.tobytes()), len(dz)))
            f.write(jpg.tobytes())
            f.write(dz)

    out = str(tmp_path / "out")
    n = extract(path, out)
    assert n == 2
    d2 = cv2.imread(os.path.join(out, "depth", "0.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(d2, depth)
    assert os.path.exists(os.path.join(out, "color", "1.jpg"))
    assert os.path.exists(os.path.join(out, "intrinsic",
                                       "intrinsic_color.txt"))


def test_autoencoder_reconstructs(rng):
    from legslam_tpu.models.autoencoder import encode, train_autoencoder, decode
    basis = rng.normal(size=(4, 32)).astype(np.float32)
    feats = rng.normal(size=(512, 4)).astype(np.float32) @ basis
    params = train_autoencoder([feats], jax.random.key(0), d=32, k=4,
                               lr=3e-3, epochs=200)
    rec = np.asarray(decode(params, encode(params, jnp.asarray(feats))))
    err = np.linalg.norm(rec - feats) / np.linalg.norm(feats)
    assert err < 0.25
    assert encode(params, jnp.asarray(feats)).shape == (512, 4)


def test_opencv_yaml():
    import tempfile
    from legslam_tpu.config import load_opencv_yaml
    body = "%YAML:1.0\n---\nCamera.fx: 600.0\nMapper.enabled: true\n" \
        "Optimization.iterations: 30000\nname: \"office0\"\n"
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        f.write(body)
        path = f.name
    cfg = load_opencv_yaml(path)
    assert cfg["Camera.fx"] == 600.0
    assert cfg["Mapper.enabled"] is True
    assert cfg["Optimization.iterations"] == 30000
    assert cfg["name"] == "office0"


def test_viewer_view_only(tmp_path, rng):
    import json
    import threading
    import urllib.request
    from legslam_tpu.serving.viewer import ViewerServer
    from legslam_tpu.utils import ply

    n = 32
    ply.save_gaussian_ply(
        str(tmp_path / "pc.ply"),
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 1, 3)).astype(np.float32),
        np.zeros((n, 15, 3), np.float32),
        np.zeros((n, 64), np.float32),
        np.zeros((n, 1), np.float32),
        np.full((n, 3), -3.0, np.float32),
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    v = ViewerServer(port=18732, host="127.0.0.1")
    v.attach_ply(str(tmp_path / "pc.ply"))
    server = v.serve_background()
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:18732/state", timeout=5) as r:
            st = json.load(r)
        assert st["gaussians"] == n
        with urllib.request.urlopen(
                "http://127.0.0.1:18732/render?w=128&h=64&r=4",
                timeout=120) as r:
            data = r.read()
        assert data[:2] == b"\xff\xd8"  # JPEG magic
    finally:
        server.shutdown()


def test_profiler_and_memory_artifacts(tmp_path):
    """jax.profiler trace scope + TpuPeakUsageMB artifact (SURVEY.md §5
    tracing/profiling; examples/replica_rgbd.cpp:280-294 equivalent)."""
    import jax.numpy as jnp

    from legslam_tpu.utils import runtime

    with runtime.profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os
    assert any(os.scandir(tmp_path / "trace"))

    stats = runtime.save_peak_memory(str(tmp_path / "mem.txt"))
    assert isinstance(stats, dict) and stats
    text = (tmp_path / "mem.txt").read_text()
    assert "peak_mb" in text


def test_viewer_slam_pane_and_map_overlay(rng):
    """SLAM-frame pane + sparse-map/frusta overlay (C18: the reference's
    map drawer, viewer/map_drawer.cpp:130 DrawMapPoints, :173 DrawKeyFrames,
    :393 DrawCurrentCamera)."""
    pytest.importorskip("cv2")
    from legslam_tpu.data.synthetic import SyntheticDataset
    from legslam_tpu.serving.viewer import ViewerServer
    from legslam_tpu.slam.tracking import TrackingFrontend

    ds = SyntheticDataset(n_frames=4, width=128, height=64,
                          n_gaussians=1200, seed=3, clutter_ratio=0.0)
    fe = TrackingFrontend(ds.intrinsics, ransac_thresh=0.1, max_corners=200)
    for frame in ds:
        fe.track(frame)
    assert fe.last_vis is not None and len(fe.last_vis["pts"]) > 0

    v = ViewerServer(frontend=fe)
    jpeg = v._slam_frame()
    assert jpeg[:2] == b"\xff\xd8"
    # overlay path draws landmarks + frusta onto a black render
    img = np.zeros((64, 128, 3), np.uint8)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    out = v._draw_map_overlay(img.copy(), R, t, 128, 64)
    assert out.shape == img.shape and (out != img).any()
