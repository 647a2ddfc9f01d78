"""Architecture parity: our Flax DINOv2 (w/ registers) vs HF torch model
with identical (random) weights."""
import numpy as np
import pytest

from legslam_tpu.models import dinov2 as D


@pytest.fixture(scope="module")
def small():
    import torch
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
    )
    torch.manual_seed(0)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=56, patch_size=14,
        num_register_tokens=4, layerscale_value=0.1, hidden_act="gelu")
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    cfg = D.DinoV2Config(image_size=56, patch_size=14, dim=64, depth=2,
                         heads=2, num_registers=4, pos_grid=4)
    params = D.convert_hf(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}, cfg)
    return model, cfg, params


def test_matches_hf(small, rng):
    import torch
    model, cfg, params = small
    img = rng.uniform(-1, 1, size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.tensor(img.transpose(0, 3, 1, 2)))
    # HF last_hidden_state rows: [cls, registers..., patches...]
    want = out_t.last_hidden_state[:, 1 + 4:].numpy()
    got = np.asarray(D.forward(params, img, cfg))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pos_embed_interpolation(small, rng):
    _, cfg, params = small
    # 70x70 -> 5x5 grid via bicubic interpolation of the 4x4 native grid
    img = rng.uniform(-1, 1, size=(1, 70, 70, 3)).astype(np.float32)
    out = D.forward(params, img, cfg)
    assert out.shape == (1, 25, 64)
    assert np.isfinite(np.asarray(out)).all()
