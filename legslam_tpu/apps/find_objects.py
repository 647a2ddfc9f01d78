"""CLI: open-vocabulary object finding + orbit video (C24 apps).

Equivalent of eval/find_objects.py / render_object.py /
find_objects_gaussians.py: load a trained map PLY, embed a text query
(Talk2DINO pipeline when weights are available, else a provided .npy
embedding), find object instances, and render orbit videos + heatmaps.

Two search modes:
  * gaussian-space (default): per-gaussian similarity -> DBSCAN clusters
    (eval/find_objects_gaussians.py).
  * --pixel-space: render every training camera from cameras.json,
    per-pixel similarity (+PAMR), best-frame selection, depth-weighted 3D
    center, heatmap overlays + an RGB/heatmap orbit video
    (eval/find_objects.py:229-434).

  python -m legslam_tpu.apps.find_objects --ply <point_cloud.ply> \
      --query "a wooden chair" --weights <converted-weights-dir> \
      [--text-emb q.npy] [--out ./output/objects] [--video]
  python -m legslam_tpu.apps.find_objects --scene <experiment/ply> \
      --pixel-space --text-emb q.npy --video
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _colormap_jet(heat: np.ndarray) -> np.ndarray:
    """uint8 BGR jet colormap of a [H, W] heat in [0, 1] (matches the
    reference's cv2.applyColorMap(COLORMAP_JET) video pane)."""
    import cv2
    h8 = np.uint8(np.clip(heat * 255, 0, 255))
    return cv2.applyColorMap(h8, cv2.COLORMAP_JET)


def run_pixel_space(args, text: np.ndarray) -> None:
    """--pixel-space driver (log_gaussian, eval/find_objects.py:229-434)."""
    import jax.numpy as jnp

    from legslam_tpu.config import RasterizeConfig
    from legslam_tpu.eval_harness.find_objects import (
        find_bboxes, orbit_trajectory, pixel_space_find_object)
    from legslam_tpu.mapper.checkpoint import state_from_ply
    from legslam_tpu.models.pamr import pamr
    from legslam_tpu.ops.rasterize import rasterize
    from legslam_tpu.utils.camera import CameraView

    scene = args.scene
    ply_path = os.path.join(scene, "point_cloud", "point_cloud.ply")
    with open(os.path.join(scene, "cameras.json")) as f:
        cameras = json.load(f)
    from legslam_tpu.utils.ply import load_gaussian_ply
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

    pamr_fn = None
    if not args.no_pamr:
        def pamr_fn(rgb, cos):
            return np.asarray(pamr(jnp.asarray(rgb),
                                   jnp.asarray(cos)[..., None]))[..., 0]

    res = pixel_space_find_object(
        render_fn, cameras, text, pamr_fn=pamr_fn,
        scene_points=raw["xyz"], n_views=args.n_views, radius=args.radius)
    os.makedirs(args.out, exist_ok=True)
    if res.best_frame < 0:
        print("No object found above threshold.")
        return
    print(f"best frame {res.best_frame}, center="
          f"{None if res.center is None else np.round(res.center, 3).tolist()}, "
          f"{len(res.viewpoints)} valid viewpoints")

    import cv2
    # heatmap overlays for every training view (the rerun stream's panes
    # become on-disk artifacts here)
    for idx in range(res.heats.shape[0]):
        rgb8 = np.uint8(np.clip(res.images[idx] * 255, 0, 255))
        jet = _colormap_jet(res.heats[idx])
        overlay = cv2.addWeighted(
            cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR), 0.5, jet, 0.5, 0)
        cv2.imwrite(os.path.join(args.out, f"heat_{idx:04d}.jpg"), overlay)
    _, best_mask = find_bboxes(res.heats[res.best_frame])
    cv2.imwrite(os.path.join(args.out, "best_mask.png"),
                np.uint8(best_mask) * 255)

    if args.rerun:
        from legslam_tpu.eval_harness.find_objects import stream_rerun
        if not stream_rerun(res, scene_points=raw["xyz"]):
            print("rerun SDK not available — skipped streaming "
                  "(artifacts on disk carry the same panes)")

    if args.video and res.center is not None:
        cam0 = cameras[0]
        w, h = int(cam0["width"]), int(cam0["height"])
        path = os.path.join(args.out, "object_pixelspace.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (w, 2 * h))
        # stacked RGB + jet heatmap panes, 10 fps (find_objects.py:364-402)
        for R, t in orbit_trajectory(res.center, args.radius, args.n_views):
            rgb, lf, _ = render_fn(R, t, w, h, cam0["fx"], cam0["fy"])
            lfn = lf / np.linalg.norm(lf, axis=-1, keepdims=True) \
                .clip(1e-12)
            te = text / max(np.linalg.norm(text), 1e-12)
            cos = lfn @ te
            if pamr_fn is not None:
                cos = pamr_fn(rgb, cos)
            heat = 1.0 - (cos - cos.min()) / max(cos.max() - cos.min(),
                                                 1e-12)
            bgr = cv2.cvtColor(np.uint8(rgb * 255), cv2.COLOR_RGB2BGR)
            vw.write(np.vstack([bgr, _colormap_jet(heat)]))
        vw.release()
        print("wrote", path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply", default=None)
    ap.add_argument("--scene", default=None,
                    help="experiment/ply dir (point_cloud + cameras.json) "
                         "for --pixel-space")
    ap.add_argument("--pixel-space", action="store_true")
    ap.add_argument("--no-pamr", action="store_true")
    ap.add_argument("--query", default=None)
    ap.add_argument("--query-image", default=None,
                    help="image-as-query: CLIP vision tower -> Talk2DINO "
                         "projection -> PCA, the same embedding space as "
                         "text (needs --weights with clip_vision.npz)")
    ap.add_argument("--weights", default=None,
                    help="converted weights dir (clip_text/talk2dino/pca)")
    ap.add_argument("--text-emb", default=None,
                    help=".npy with a precomputed [64] query embedding")
    ap.add_argument("--out", default="./output/objects")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--rerun", action="store_true",
                    help="stream panes to a rerun.io viewer when the SDK "
                    "is installed (eval/find_objects.py:404-434)")
    ap.add_argument("--n-views", type=int, default=60)
    ap.add_argument("--radius", type=float, default=1.5)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from legslam_tpu.config import RasterizeConfig
    from legslam_tpu.eval_harness.find_objects import (
        find_objects_in_gaussians,
        inverted_similarity,
        orbit_trajectory,
    )
    from legslam_tpu.mapper.checkpoint import state_from_ply
    from legslam_tpu.ops.rasterize import rasterize
    from legslam_tpu.utils.camera import CameraView
    from legslam_tpu.utils.ply import load_gaussian_ply

    if args.text_emb:
        text = np.load(args.text_emb).reshape(-1)
    elif args.query_image and args.weights:
        import cv2
        from legslam_tpu.models.talk2dino import build_image_embedding
        from legslam_tpu.models.weights_io import load_image_pipeline
        vision, proj, pca = load_image_pipeline(args.weights)
        rgb = cv2.cvtColor(cv2.imread(args.query_image), cv2.COLOR_BGR2RGB)
        text = np.asarray(build_image_embedding(
            vision, proj, pca, jnp.asarray(rgb, jnp.float32) / 255.0))
    elif args.query and args.weights:
        from legslam_tpu.models.talk2dino import build_text_embedding
        from legslam_tpu.models.weights_io import load_text_pipeline
        clip_params, proj, pca = load_text_pipeline(args.weights)
        text = np.asarray(build_text_embedding(
            [args.query], clip_params, proj, pca))[0]
    else:
        raise SystemExit("provide --text-emb, --query-image + --weights, "
                         "or --query + --weights")

    if args.pixel_space:
        if not args.scene:
            raise SystemExit("--pixel-space needs --scene <experiment/ply>")
        run_pixel_space(args, text)
        return
    if not args.ply:
        raise SystemExit("gaussian-space mode needs --ply")
    raw = load_gaussian_ply(args.ply)
    n = raw["xyz"].shape[0]

    dets = find_objects_in_gaussians(raw["xyz"], raw["lang_feat"], text)
    print(f"{len(dets)} object instance(s) for query")
    os.makedirs(args.out, exist_ok=True)
    for i, d in enumerate(dets[:5]):
        print(f"  #{i}: center={np.round(d.center, 3).tolist()} "
              f"gaussians={d.n_gaussians} score={d.score:.3f}")

    if not args.video or not dets:
        return

    import cv2
    cap = max(256, 1 << int(np.ceil(np.log2(n))))
    st = state_from_ply(args.ply, cap)
    cfg = RasterizeConfig()
    heat = inverted_similarity(raw["lang_feat"], text[None])[0]
    heat_full = np.zeros(cap, np.float32)
    heat_full[:n] = heat

    for i, det in enumerate(dets[:3]):
        path = os.path.join(args.out, f"object_{i}.mp4")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (args.width, args.height))
        for R, t in orbit_trajectory(det.center, args.radius, args.n_views):
            view = CameraView.create(R, t, args.width, args.height,
                                     fx=0.8 * args.width,
                                     fy=0.8 * args.width)
            out = rasterize(
                st.params.xyz, st.sh(), st.params.lang_feat,
                st.opacities(), st.scales(), st.params.rotation, st.valid,
                view, jnp.zeros(3), 3, cfg, include_lang_feat=False)
            img = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(
                np.uint8)
            vw.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        vw.release()
        print("wrote", path)


if __name__ == "__main__":
    main()
