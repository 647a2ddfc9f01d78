"""CLI: open-vocabulary object finding + orbit video (C24 apps).

Equivalent of eval/find_objects.py / render_object.py /
find_objects_gaussians.py: load a trained map PLY, embed a text query
(Talk2DINO pipeline when weights are available, else a provided .npy
embedding), find object instances in gaussian space, and render orbit
videos + heatmaps around each detection.

  python -m legslam_tpu.apps.find_objects --ply <point_cloud.ply> \
      --query "a wooden chair" --weights <converted-weights-dir> \
      [--text-emb q.npy] [--out ./output/objects] [--video]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--weights", default=None,
                    help="converted weights dir (clip_text/talk2dino/pca)")
    ap.add_argument("--text-emb", default=None,
                    help=".npy with a precomputed [64] query embedding")
    ap.add_argument("--out", default="./output/objects")
    ap.add_argument("--video", action="store_true")
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

    raw = load_gaussian_ply(args.ply)
    n = raw["xyz"].shape[0]

    if args.text_emb:
        text = np.load(args.text_emb).reshape(-1)
    elif args.query and args.weights:
        from legslam_tpu.models.talk2dino import build_text_embedding
        from legslam_tpu.models.weights_io import load_text_pipeline
        clip_params, proj, pca = load_text_pipeline(args.weights)
        text = np.asarray(build_text_embedding(
            [args.query], clip_params, proj, pca))[0]
    else:
        raise SystemExit("provide --text-emb or (--query + --weights)")

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
