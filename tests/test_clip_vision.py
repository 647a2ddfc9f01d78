"""Architecture parity: our CLIP vision tower vs HF torch model with
identical (random) weights, + the image-as-query pipeline shape
(eval/utils.py:113-171)."""
import jax
import numpy as np
import pytest

from legslam_tpu.models import clip_vision as CV
from legslam_tpu.models import pca as PCA
from legslam_tpu.models import talk2dino as T2D


@pytest.fixture(scope="module")
def small():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        projection_dim=32, hidden_act="quick_gelu")
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CV.ClipVisionConfig(image_size=32, patch=16, width=64, layers=2,
                              heads=2, proj_dim=32)
    params = CV.convert_hf(
        {k: v.detach().numpy() for k, v in model.state_dict().items()},
        cfg=cfg)
    return model, cfg, params


def test_matches_hf(small, rng):
    import torch
    model, cfg, params = small
    img = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.tensor(img.transpose(0, 3, 1, 2)))
    want = out_t.image_embeds.numpy()
    got = np.asarray(CV.encode_image(params, img, cfg))
    assert got.shape == want.shape == (2, 32)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_image_query_pipeline(small, rng):
    """build_image_embedding = CLIP vision -> Talk2DINO projection ->
    L2 norm -> PCA, the reference's image-as-query route."""
    _, cfg, params = small
    proj = T2D.init_projection(jax.random.key(0), clip_dim=32, dino_dim=48)
    comps = rng.normal(size=(8, 48)).astype(np.float32)
    pca = PCA.PCAParams(mean=np.zeros(48, np.float32), components=comps)
    rgb = rng.uniform(size=(40, 60, 3)).astype(np.float32)
    emb = np.asarray(T2D.build_image_embedding(params, proj, pca, rgb,
                                               vision_cfg=cfg))
    assert emb.shape == (8,)
    assert np.isfinite(emb).all()
    # the pre-PCA embedding is L2-normalized in 48-D projection space
    emb_nopca = np.asarray(T2D.build_image_embedding(params, proj, None,
                                                     rgb, vision_cfg=cfg))
    assert abs(np.linalg.norm(emb_nopca) - 1.0) < 1e-5
