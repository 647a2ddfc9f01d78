"""Language encoder stack: CLIP text parity, PCA, Talk2DINO, fused encoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legslam_tpu.models import clip_text as CT
from legslam_tpu.models import dinov2 as D
from legslam_tpu.models import pca as PCA
from legslam_tpu.models import talk2dino as T2D
from legslam_tpu.models.encoder import LanguageFeaturesEncoder


def test_clip_text_matches_hf(rng):
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    torch.manual_seed(0)
    hf_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=32, eos_token_id=999, bos_token_id=998)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = CT.ClipTextConfig(vocab=1000, context=77, width=64, layers=2,
                            heads=2, proj_dim=32)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = CT.convert_hf(sd, cfg=cfg)

    toks = np.full((3, 77), 5, np.int32)
    lengths = [4, 9, 20]
    for i, ln in enumerate(lengths):
        toks[i, 0] = 998
        toks[i, 1:ln] = rng.integers(1, 990, ln - 1)
        toks[i, ln] = 999
        toks[i, ln + 1:] = 0  # pad id < eos for argmax pooling
    import torch as th
    with th.no_grad():
        out_t = model(input_ids=th.tensor(toks.astype(np.int64)))
    got = np.asarray(CT.encode_text(params, jnp.asarray(toks), cfg))
    np.testing.assert_allclose(got, out_t.text_embeds.numpy(), atol=2e-4,
                               rtol=1e-3)


def test_pca_fit_and_apply(rng):
    # features with known low-rank structure
    basis = rng.normal(size=(8, 32)).astype(np.float32)
    z = rng.normal(size=(5000, 8)).astype(np.float32) * \
        np.array([10, 8, 6, 4, 2, 1, 0.5, 0.1], np.float32)
    feats = z @ basis + rng.normal(scale=0.01, size=(5000, 32)) \
        .astype(np.float32) + 3.0
    params = PCA.fit_pca([feats[:2500], feats[2500:]], k=8)
    out = np.asarray(PCA.apply_pca(params, jnp.asarray(feats)))
    # reconstruction through the top-8 axes captures nearly all variance
    recon = out @ np.asarray(params.components) + np.asarray(params.mean)
    err = np.linalg.norm(recon - feats) / np.linalg.norm(feats - feats.mean(0))
    assert err < 0.05
    # components orthonormal
    C = np.asarray(params.components)
    np.testing.assert_allclose(C @ C.T, np.eye(8), atol=1e-4)


def _encode_onnx_pca(path, mean, comp):
    """Hand-encode a minimal ONNX ModelProto carrying the two PCA
    initializers (Sub->MatMul graph constants) in protobuf wire format —
    the same byte layout onnx.save produces for the reference's
    pca_text_emb64_*.onnx (src/compressor_models.cpp:32-98)."""
    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def field(no, wt, payload):
        tag = varint((no << 3) | wt)
        if wt == 2:
            return tag + varint(len(payload)) + payload
        return tag + varint(payload)

    def tensor(name, arr):
        msg = b""
        for d in arr.shape:
            msg += field(1, 0, d)
        msg += field(2, 0, 1)                       # data_type FLOAT
        msg += field(8, 2, name.encode())
        msg += field(9, 2, np.ascontiguousarray(arr, "<f4").tobytes())
        return msg

    graph = field(5, 2, tensor("mean", mean)) + \
        field(5, 2, tensor("weights", comp))
    model = field(1, 0, 7) + field(7, 2, graph)     # ir_version + graph
    with open(path, "wb") as f:
        f.write(model)


def test_pca_from_onnx_and_converter_cli(rng, tmp_path):
    """from_onnx reads the reference's PCA ONNX artifact (via the
    dependency-free wire-format reader — the image ships without the
    onnx package) and tools/convert_weights.py drives it end-to-end to
    pca.npz (VERDICT r3 #6: the converter route had zero test refs)."""
    mean = rng.normal(size=(768,)).astype(np.float32)
    comp = rng.normal(size=(64, 768)).astype(np.float32)
    onnx_path = tmp_path / "pca_text_emb64_test.onnx"
    _encode_onnx_pca(str(onnx_path), mean, comp)

    params = PCA.from_onnx(str(onnx_path))
    np.testing.assert_allclose(np.asarray(params.mean), mean, atol=0)
    np.testing.assert_allclose(np.asarray(params.components), comp, atol=0)

    # the [D, K] transposed export (some reference dumps store weights
    # for x @ W) is normalized to [K, D]
    _encode_onnx_pca(str(onnx_path), mean.reshape(1, -1),
                     np.ascontiguousarray(comp.T))
    p2 = PCA.from_onnx(str(onnx_path))
    np.testing.assert_allclose(np.asarray(p2.components), comp, atol=0)

    from tools.convert_weights import main as convert_main
    out = tmp_path / "weights"
    convert_main(["--out", str(out), "--pca-onnx", str(onnx_path)])
    loaded = PCA.load(str(out / "pca.npz"))
    np.testing.assert_allclose(np.asarray(loaded.mean), mean, atol=0)
    feats = rng.normal(size=(5, 768)).astype(np.float32)
    got = np.asarray(PCA.apply_pca(loaded, jnp.asarray(feats)))
    np.testing.assert_allclose(got, (feats - mean) @ comp.T, rtol=2e-5,
                               atol=1e-4)


def test_projection_layer_matches_torch(rng):
    import torch
    w1 = rng.normal(size=(768, 512)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(768,)).astype(np.float32)
    w2 = rng.normal(size=(768, 768)).astype(np.float32) * 0.05
    b2 = rng.normal(size=(768,)).astype(np.float32)
    proj = T2D.ProjectionParams(
        linear_w=jnp.asarray(w1.T), linear_b=jnp.asarray(b1),
        hidden_ws=(jnp.asarray(w2.T),), hidden_bs=(jnp.asarray(b2),))
    x = rng.normal(size=(5, 512)).astype(np.float32)
    got = np.asarray(T2D.project_clip_text(proj, jnp.asarray(x)))
    xt = torch.tensor(x)
    want = torch.tanh(xt @ torch.tensor(w1).T + torch.tensor(b1)) \
        @ torch.tensor(w2).T + torch.tensor(b2)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_reference_projection_weights_load():
    import os
    path = "/root/reference/weights/vitb_mlp_infonce.pth"
    if not os.path.exists(path):
        pytest.skip("reference weights not mounted")
    proj = T2D.load_projection(path)
    assert proj.linear_w.shape == (512, 768)
    assert len(proj.hidden_ws) == 1
    out = T2D.project_clip_text(proj, jnp.ones((2, 512)))
    assert out.shape == (2, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_encoder_shapes(rng):
    cfg = D.DinoV2Config(image_size=56, patch_size=14, dim=64, depth=2,
                         heads=2, num_registers=4, pos_grid=4)
    dino = D.init_params(cfg, jax.random.key(0))
    pca = PCA.PCAParams(mean=jnp.zeros(64),
                        components=jnp.asarray(
                            rng.normal(size=(16, 64)).astype(np.float32)))
    enc = LanguageFeaturesEncoder(dino, pca, cfg, dtype=jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(30, 40, 3)), jnp.float32)
    lf = enc.create_language_features(rgb)
    assert lf.shape == (4, 4, 16)
    assert np.isfinite(np.asarray(lf)).all()


def test_cosine_heatmap(rng):
    lf = rng.normal(size=(8, 10, 16)).astype(np.float32)
    text = rng.normal(size=(3, 16)).astype(np.float32)
    hm = np.asarray(T2D.cosine_heatmap(jnp.asarray(lf), jnp.asarray(text)))
    assert hm.shape == (3, 8, 10)
    assert hm.min() >= 0.0 and hm.max() <= 1.0 + 1e-6
    raw = np.asarray(T2D.cosine_heatmap(jnp.asarray(lf), jnp.asarray(text),
                                        invert=False))
    assert raw.min() >= -1.0 - 1e-5 and raw.max() <= 1.0 + 1e-5
