"""CLI: multi-prompt labeled object detection over training frames (C24).

Equivalent of eval/detect_objects.py — but takes a LIST of prompts per
invocation: per-prompt embeddings, per-frame labeled bboxes, an annotated
RGB + heat video (stacked panes at 10 fps like the reference's
VideoWriter, detect_objects.py:96-141), a detections.json artifact, and
an optional rerun stream (detect_objects.py:143-186).

  python -m legslam_tpu.apps.detect_objects --scene <experiment/ply> \
      --prompts "a chair" "a table" --weights <converted-weights-dir> \
      [--text-embs q.npy] [--out ./output/detect] [--video] [--rerun]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def build_render_fn(scene: str):
    """Shared PLY -> render_fn loader (same contract as find_objects
    --pixel-space)."""
    import jax.numpy as jnp

    from legslam_tpu.config import RasterizeConfig
    from legslam_tpu.mapper.checkpoint import state_from_ply
    from legslam_tpu.ops.rasterize import rasterize
    from legslam_tpu.utils.camera import CameraView
    from legslam_tpu.utils.ply import load_gaussian_ply

    ply_path = os.path.join(scene, "point_cloud", "point_cloud.ply")
    with open(os.path.join(scene, "cameras.json")) as f:
        cameras = json.load(f)
    raw = load_gaussian_ply(ply_path)
    n = raw["xyz"].shape[0]
    cap = max(256, 1 << int(np.ceil(np.log2(n))))
    st = state_from_ply(ply_path, cap)
    cfg = RasterizeConfig()

    def render_fn(R, t, width, height, fx, fy):
        view = CameraView.create(R, t, width, height, fx=fx, fy=fy)
        out = rasterize(
            st.params.xyz, st.sh(), st.params.lang_feat, st.opacities(),
            st.scales(), st.params.rotation, st.valid, view, jnp.zeros(3),
            3, cfg, include_lang_feat=True)
        return (np.clip(np.asarray(out.color), 0, 1),
                np.asarray(out.lang_feat), np.asarray(out.depth))

    return render_fn, cameras, raw


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", required=True,
                    help="experiment/ply dir (point_cloud + cameras.json)")
    ap.add_argument("--prompts", nargs="+", default=None,
                    help="text prompts (needs --weights)")
    ap.add_argument("--weights", default=None,
                    help="converted weights dir (clip_text/talk2dino/pca)")
    ap.add_argument("--text-embs", default=None,
                    help=".npy with precomputed [Q, 64] prompt embeddings "
                         "(rows align with --prompts labels, or p0..pN)")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="heat threshold (detect_objects.py:131)")
    ap.add_argument("--no-pamr", action="store_true")
    ap.add_argument("--out", default="./output/detect")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--rerun", action="store_true")
    args = ap.parse_args(argv)

    from legslam_tpu.eval_harness.detect_objects import (
        annotate_frame, detect_objects_in_frames, stream_rerun_detections)

    if args.text_embs:
        text = np.load(args.text_embs).reshape(-1, 64)
        prompts = args.prompts or [f"p{i}" for i in range(text.shape[0])]
        if len(prompts) != text.shape[0]:
            raise SystemExit("--prompts count must match --text-embs rows")
    elif args.prompts and args.weights:
        from legslam_tpu.models.talk2dino import build_text_embedding
        from legslam_tpu.models.weights_io import load_text_pipeline
        clip_params, proj, pca = load_text_pipeline(args.weights)
        prompts = args.prompts
        text = np.asarray(build_text_embedding(
            prompts, clip_params, proj, pca))
    else:
        raise SystemExit("provide --text-embs or --prompts + --weights")

    render_fn, cameras, raw = build_render_fn(args.scene)

    pamr_fn = None
    if not args.no_pamr:
        import jax.numpy as jnp

        from legslam_tpu.models.pamr import pamr

        def pamr_fn(rgb, cos):
            return np.asarray(pamr(jnp.asarray(rgb),
                                   jnp.asarray(cos)[..., None]))[..., 0]

    res = detect_objects_in_frames(render_fn, cameras, text, prompts,
                                   pamr_fn=pamr_fn,
                                   threshold=args.threshold)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "detections.json"), "w") as f:
        json.dump({
            "prompts": prompts,
            "counts": res.counts(),
            "frames": [dataclasses.asdict(fd) for fd in res.frames],
        }, f, indent=1, default=int)
    print(json.dumps(res.counts()))

    if args.video:
        import cv2
        cam0 = cameras[0]
        w, h = int(cam0["width"]), int(cam0["height"])
        path = os.path.join(args.out, "detections.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (w, 2 * h))
        # stacked annotated-RGB + jet pane of the max heat across prompts
        # (the reference stacks RGB over the single prompt's heat,
        # detect_objects.py:136-141)
        for fd in res.frames:
            bgr = annotate_frame(res.images[fd.frame], fd, prompts)
            heat = res.heats[:, fd.frame].max(axis=0)
            jet = cv2.applyColorMap(np.uint8(np.clip(heat * 255, 0, 255)),
                                    cv2.COLORMAP_JET)
            vw.write(np.vstack([bgr, jet]))
        vw.release()
        print("wrote", path)

    if args.rerun:
        if not stream_rerun_detections(res, scene_points=raw["xyz"]):
            print("rerun SDK not available — skipped streaming "
                  "(detections.json + video carry the same content)")


if __name__ == "__main__":
    main()
