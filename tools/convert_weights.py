"""Convert reference model artifacts into legslam_tpu .npz layouts.

Sources (any subset; all optional):
  --dinov2-hub PATH       torch-hub dinov2_vitb14_reg checkpoint (.pth)
  --dinov2-hf  NAME/DIR   HF Dinov2WithRegistersModel name or local dir
  --pca-onnx  PATH        reference pca_text_emb64_*.onnx
  --clip-openai PATH      OpenAI CLIP ViT-B/16 state dict (.pt)
  --clip-hf  NAME/DIR     HF CLIPTextModelWithProjection name or dir
  --talk2dino PATH        weights/vitb_mlp_infonce.pth
  --lpips-alex PATH       lpips package alex.pth (lin weights); needs
                          torchvision's pretrained alexnet importable for
                          the feature trunk

Outputs <out>/dinov2.npz, pca.npz, clip_text.npz, clip_vision.npz, talk2dino_proj.npz,
lpips_alex.npz.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--dinov2-hub")
    p.add_argument("--dinov2-hf")
    p.add_argument("--pca-onnx")
    p.add_argument("--clip-openai")
    p.add_argument("--clip-hf")
    p.add_argument("--talk2dino")
    p.add_argument("--lpips-alex")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    from legslam_tpu.models import clip_text as CT
    from legslam_tpu.models import dinov2 as D
    from legslam_tpu.models import pca as PCA
    from legslam_tpu.models import talk2dino as T2D
    from legslam_tpu.models.weights_io import save_params

    if args.dinov2_hub:
        import torch
        sd = torch.load(args.dinov2_hub, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        save_params(os.path.join(args.out, "dinov2.npz"),
                    D.convert_torch_hub(sd))
        print("wrote dinov2.npz (torch-hub)")
    elif args.dinov2_hf:
        from transformers import Dinov2WithRegistersModel
        model = Dinov2WithRegistersModel.from_pretrained(args.dinov2_hf)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        save_params(os.path.join(args.out, "dinov2.npz"), D.convert_hf(sd))
        print("wrote dinov2.npz (hf)")

    if args.pca_onnx:
        PCA.save(os.path.join(args.out, "pca.npz"),
                 PCA.from_onnx(args.pca_onnx))
        print("wrote pca.npz")

    if args.clip_openai:
        import torch
        obj = torch.load(args.clip_openai, map_location="cpu",
                         weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        sd = {k: np.asarray(v.float()) for k, v in sd.items()}
        save_params(os.path.join(args.out, "clip_text.npz"),
                    CT.convert_openai(sd))
        print("wrote clip_text.npz (openai)")
        # the same OpenAI checkpoint carries the vision tower, which the
        # image-as-query route needs (eval/utils.py:113-171)
        from legslam_tpu.models import clip_vision as CV
        save_params(os.path.join(args.out, "clip_vision.npz"),
                    CV.convert_openai(sd))
        print("wrote clip_vision.npz (openai)")
    elif args.clip_hf:
        from transformers import CLIPTextModelWithProjection
        model = CLIPTextModelWithProjection.from_pretrained(args.clip_hf)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        save_params(os.path.join(args.out, "clip_text.npz"),
                    CT.convert_hf(sd))
        print("wrote clip_text.npz (hf)")

    if args.lpips_alex:
        import torch
        from torchvision.models import alexnet
        trunk = alexnet(weights="IMAGENET1K_V1").features.state_dict()
        lin = torch.load(args.lpips_alex, map_location="cpu",
                         weights_only=True)
        out = {}
        # torchvision features indices of the 5 convs: 0, 3, 6, 8, 10
        for i, idx in enumerate((0, 3, 6, 8, 10)):
            w = trunk[f"{idx}.weight"].numpy()          # OIHW
            out[f"conv{i}/w"] = w.transpose(2, 3, 1, 0)  # -> HWIO
            out[f"conv{i}/b"] = trunk[f"{idx}.bias"].numpy()
            lw = lin[f"lin{i}.model.1.weight"].numpy()  # [1, C, 1, 1]
            out[f"lin{i}/w"] = lw.reshape(-1)
        np.savez(os.path.join(args.out, "lpips_alex.npz"), **out)
        print("wrote lpips_alex.npz")

    if args.talk2dino:
        proj = T2D.load_projection(args.talk2dino)
        save_params(os.path.join(args.out, "talk2dino_proj.npz"), dict(
            linear_w=proj.linear_w, linear_b=proj.linear_b,
            hidden_ws=list(proj.hidden_ws), hidden_bs=list(proj.hidden_bs)))
        print("wrote talk2dino_proj.npz")


if __name__ == "__main__":
    main()
