"""Metric-backbone weight-arrival rehearsal (round-4 verdict item 8).

The SD checkpoint path has a full dress rehearsal
(tests/test_real_weights_rehearsal.py); this module does the same for the
METRIC backbones: synthesize random state dicts in the ORIGINAL torch layouts
(openai `clip.load("ViT-B/16").state_dict()`, facebookresearch DINO/DINOv2
`torch.hub` state dicts — what tools/convert_weights.py dumps to .npz), map
them through models/backbone_weights.py onto the Flax towers, and assert the
Flax forward equals an independent torch implementation of the original
architecture.  This pins every transpose / fused-qkv split / pooling
convention the real weights will hit.

Reference anchors: /root/reference/metrics/clip_similarity.py:160-180 (openai
CLIP), dino_vit_structure.py:23-60 (torch.hub DINO).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# synthetic torch-layout state dicts
# ---------------------------------------------------------------------------

def _rand_openai_clip_sd(rs, hidden=32, layers=2, patch=16, image=32,
                         proj=16, vocab=512, ctx=77):
    sd = {}
    npos = (image // patch) ** 2 + 1

    def resblock(prefix):
        sd[f"{prefix}.ln_1.weight"] = rs.randn(hidden) * 0.1 + 1
        sd[f"{prefix}.ln_1.bias"] = rs.randn(hidden) * 0.1
        sd[f"{prefix}.attn.in_proj_weight"] = rs.randn(3 * hidden, hidden) * 0.1
        sd[f"{prefix}.attn.in_proj_bias"] = rs.randn(3 * hidden) * 0.1
        sd[f"{prefix}.attn.out_proj.weight"] = rs.randn(hidden, hidden) * 0.1
        sd[f"{prefix}.attn.out_proj.bias"] = rs.randn(hidden) * 0.1
        sd[f"{prefix}.ln_2.weight"] = rs.randn(hidden) * 0.1 + 1
        sd[f"{prefix}.ln_2.bias"] = rs.randn(hidden) * 0.1
        sd[f"{prefix}.mlp.c_fc.weight"] = rs.randn(4 * hidden, hidden) * 0.1
        sd[f"{prefix}.mlp.c_fc.bias"] = rs.randn(4 * hidden) * 0.1
        sd[f"{prefix}.mlp.c_proj.weight"] = rs.randn(hidden, 4 * hidden) * 0.1
        sd[f"{prefix}.mlp.c_proj.bias"] = rs.randn(hidden) * 0.1

    sd["visual.conv1.weight"] = rs.randn(hidden, 3, patch, patch) * 0.1
    sd["visual.class_embedding"] = rs.randn(hidden) * 0.1
    sd["visual.positional_embedding"] = rs.randn(npos, hidden) * 0.1
    sd["visual.ln_pre.weight"] = rs.randn(hidden) * 0.1 + 1
    sd["visual.ln_pre.bias"] = rs.randn(hidden) * 0.1
    for i in range(layers):
        resblock(f"visual.transformer.resblocks.{i}")
    sd["visual.ln_post.weight"] = rs.randn(hidden) * 0.1 + 1
    sd["visual.ln_post.bias"] = rs.randn(hidden) * 0.1
    sd["visual.proj"] = rs.randn(hidden, proj) * 0.1

    sd["token_embedding.weight"] = rs.randn(vocab, hidden) * 0.1
    sd["positional_embedding"] = rs.randn(ctx, hidden) * 0.1
    for i in range(layers):
        resblock(f"transformer.resblocks.{i}")
    sd["ln_final.weight"] = rs.randn(hidden) * 0.1 + 1
    sd["ln_final.bias"] = rs.randn(hidden) * 0.1
    sd["text_projection"] = rs.randn(hidden, proj) * 0.1
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _rand_dino_sd(rs, hidden=32, layers=2, patch=8, image=32, layerscale=False):
    sd = {}
    npos = (image // patch) ** 2 + 1
    sd["patch_embed.proj.weight"] = rs.randn(hidden, 3, patch, patch) * 0.1
    sd["patch_embed.proj.bias"] = rs.randn(hidden) * 0.1
    sd["cls_token"] = rs.randn(1, 1, hidden) * 0.1
    sd["pos_embed"] = rs.randn(1, npos, hidden) * 0.1
    for i in range(layers):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rs.randn(hidden) * 0.1 + 1
        sd[f"{p}.norm1.bias"] = rs.randn(hidden) * 0.1
        sd[f"{p}.attn.qkv.weight"] = rs.randn(3 * hidden, hidden) * 0.1
        sd[f"{p}.attn.qkv.bias"] = rs.randn(3 * hidden) * 0.1
        sd[f"{p}.attn.proj.weight"] = rs.randn(hidden, hidden) * 0.1
        sd[f"{p}.attn.proj.bias"] = rs.randn(hidden) * 0.1
        sd[f"{p}.norm2.weight"] = rs.randn(hidden) * 0.1 + 1
        sd[f"{p}.norm2.bias"] = rs.randn(hidden) * 0.1
        sd[f"{p}.mlp.fc1.weight"] = rs.randn(4 * hidden, hidden) * 0.1
        sd[f"{p}.mlp.fc1.bias"] = rs.randn(4 * hidden) * 0.1
        sd[f"{p}.mlp.fc2.weight"] = rs.randn(hidden, 4 * hidden) * 0.1
        sd[f"{p}.mlp.fc2.bias"] = rs.randn(hidden) * 0.1
        if layerscale:
            sd[f"{p}.ls1.gamma"] = rs.rand(hidden) * 0.2
            sd[f"{p}.ls2.gamma"] = rs.rand(hidden) * 0.2
    sd["norm.weight"] = rs.randn(hidden) * 0.1 + 1
    sd["norm.bias"] = rs.randn(hidden) * 0.1
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# torch replicas of the ORIGINAL architectures, consuming the torch layouts
# ---------------------------------------------------------------------------

def _torch_mha(sd, prefix, x, heads):
    """nn.MultiheadAttention semantics: fused in_proj rows [q; k; v]."""
    b, s, c = x.shape
    hd = c // heads
    w = _t(sd[f"{prefix}.attn.in_proj_weight"])
    bias = _t(sd[f"{prefix}.attn.in_proj_bias"])
    qkv = F.linear(x, w, bias)
    q, k, v = qkv.chunk(3, dim=-1)
    q = q.view(b, s, heads, hd).permute(0, 2, 1, 3)
    k = k.view(b, s, heads, hd).permute(0, 2, 1, 3)
    v = v.view(b, s, heads, hd).permute(0, 2, 1, 3)
    return q, k, v


def _torch_clip_resblock(sd, prefix, x, heads, causal):
    b, s, c = x.shape
    h = F.layer_norm(x, (c,), _t(sd[f"{prefix}.ln_1.weight"]),
                     _t(sd[f"{prefix}.ln_1.bias"]), eps=1e-5)
    q, k, v = _torch_mha(sd, prefix, h, heads)
    logits = q @ k.transpose(-1, -2) * (c // heads) ** -0.5
    if causal:
        mask = torch.tril(torch.ones(s, s, dtype=torch.bool))
        logits = torch.where(mask, logits, torch.tensor(-1e30))
    o = (torch.softmax(logits, dim=-1) @ v).permute(0, 2, 1, 3).reshape(b, s, c)
    o = F.linear(o, _t(sd[f"{prefix}.attn.out_proj.weight"]),
                 _t(sd[f"{prefix}.attn.out_proj.bias"]))
    x = x + o
    h = F.layer_norm(x, (c,), _t(sd[f"{prefix}.ln_2.weight"]),
                     _t(sd[f"{prefix}.ln_2.bias"]), eps=1e-5)
    h = F.linear(h, _t(sd[f"{prefix}.mlp.c_fc.weight"]),
                 _t(sd[f"{prefix}.mlp.c_fc.bias"]))
    h = h * torch.sigmoid(1.702 * h)  # openai quick-gelu
    return x + F.linear(h, _t(sd[f"{prefix}.mlp.c_proj.weight"]),
                        _t(sd[f"{prefix}.mlp.c_proj.bias"]))


def _torch_openai_clip_image(sd, pixels_nchw, layers, heads):
    x = F.conv2d(pixels_nchw, _t(sd["visual.conv1.weight"]),
                 stride=sd["visual.conv1.weight"].shape[-1])
    b, c = x.shape[0], x.shape[1]
    x = x.flatten(2).transpose(1, 2)
    cls = _t(sd["visual.class_embedding"]).view(1, 1, c).expand(b, 1, c)
    x = torch.cat([cls, x], dim=1)
    x = x + _t(sd["visual.positional_embedding"])[None]
    x = F.layer_norm(x, (c,), _t(sd["visual.ln_pre.weight"]),
                     _t(sd["visual.ln_pre.bias"]), eps=1e-5)
    for i in range(layers):
        x = _torch_clip_resblock(sd, f"visual.transformer.resblocks.{i}", x,
                                 heads, causal=False)
    pooled = F.layer_norm(x[:, 0], (c,), _t(sd["visual.ln_post.weight"]),
                          _t(sd["visual.ln_post.bias"]), eps=1e-5)
    return pooled @ _t(sd["visual.proj"])  # openai applies x @ proj


def _torch_openai_clip_text(sd, ids, layers, heads):
    emb = _t(sd["token_embedding.weight"])
    x = emb[torch.from_numpy(np.asarray(ids, np.int64))]
    c = x.shape[-1]
    x = x + _t(sd["positional_embedding"])[None, : x.shape[1]]
    for i in range(layers):
        x = _torch_clip_resblock(sd, f"transformer.resblocks.{i}", x, heads,
                                 causal=True)
    x = F.layer_norm(x, (c,), _t(sd["ln_final.weight"]),
                     _t(sd["ln_final.bias"]), eps=1e-5)
    eos = np.argmax(ids, axis=-1)
    pooled = x[torch.arange(x.shape[0]), torch.from_numpy(eos)]
    return pooled @ _t(sd["text_projection"])


def _torch_dino_forward(sd, pixels_nchw, layers, heads, layerscale):
    patch = sd["patch_embed.proj.weight"].shape[-1]
    x = F.conv2d(pixels_nchw, _t(sd["patch_embed.proj.weight"]),
                 _t(sd["patch_embed.proj.bias"]), stride=patch)
    b, c = x.shape[0], x.shape[1]
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([_t(sd["cls_token"]).view(1, 1, c).expand(b, 1, c), x], dim=1)
    x = x + _t(sd["pos_embed"]).view(1, -1, c)
    keys = None
    for i in range(layers):
        p = f"blocks.{i}"
        s = x.shape[1]
        hd = c // heads
        h = F.layer_norm(x, (c,), _t(sd[f"{p}.norm1.weight"]),
                         _t(sd[f"{p}.norm1.bias"]), eps=1e-6)
        qkv = F.linear(h, _t(sd[f"{p}.attn.qkv.weight"]),
                       _t(sd[f"{p}.attn.qkv.bias"]))
        q, k, v = qkv.chunk(3, dim=-1)
        keys = k  # layer-11 analogue: last block's keys
        q = q.view(b, s, heads, hd).permute(0, 2, 1, 3)
        k = k.view(b, s, heads, hd).permute(0, 2, 1, 3)
        v = v.view(b, s, heads, hd).permute(0, 2, 1, 3)
        probs = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        o = (probs @ v).permute(0, 2, 1, 3).reshape(b, s, c)
        o = F.linear(o, _t(sd[f"{p}.attn.proj.weight"]),
                     _t(sd[f"{p}.attn.proj.bias"]))
        if layerscale:
            o = o * _t(sd[f"{p}.ls1.gamma"])
        x = x + o
        h = F.layer_norm(x, (c,), _t(sd[f"{p}.norm2.weight"]),
                         _t(sd[f"{p}.norm2.bias"]), eps=1e-6)
        h = F.linear(h, _t(sd[f"{p}.mlp.fc1.weight"]), _t(sd[f"{p}.mlp.fc1.bias"]))
        h = F.gelu(h)
        h = F.linear(h, _t(sd[f"{p}.mlp.fc2.weight"]), _t(sd[f"{p}.mlp.fc2.bias"]))
        if layerscale:
            h = h * _t(sd[f"{p}.ls2.gamma"])
        x = x + h
    out = F.layer_norm(x, (c,), _t(sd["norm.weight"]), _t(sd["norm.bias"]),
                       eps=1e-6)
    return out, keys


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_openai_clip_mapping_matches_torch():
    from eta_inversion_tpu.metrics.clip_similarity import get_clip_backbone
    from eta_inversion_tpu.models.backbone_weights import (
        map_openai_clip_text, map_openai_clip_vision, to_jax)
    from eta_inversion_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                               CLIPTextProjector,
                                               CLIPVisionEncoder)

    rs = np.random.RandomState(3)
    sd = _rand_openai_clip_sd(rs)
    vcfg = CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                            num_layers=2, num_heads=2, projection_dim=16)
    tcfg = CLIPTextConfig(vocab_size=512, hidden_size=32, num_layers=2,
                          num_heads=2)

    pixels = rs.rand(2, 32, 32, 3).astype(np.float32)
    ids = rs.randint(1, 400, size=(2, 77)).astype(np.int32)
    ids[0, 9] = 511  # argmax = eot position (openai convention)
    ids[1, 30] = 511

    vision = CLIPVisionEncoder(vcfg)
    got_img = np.asarray(vision.apply(
        {"params": to_jax(map_openai_clip_vision(sd, 2))}, jnp.asarray(pixels)))
    want_img = _torch_openai_clip_image(
        sd, _t(pixels).permute(0, 3, 1, 2), 2, 2).numpy()
    np.testing.assert_allclose(got_img, want_img, rtol=2e-5, atol=2e-5)

    text = CLIPTextProjector(tcfg, 16)
    got_txt = np.asarray(text.apply(
        {"params": to_jax(map_openai_clip_text(sd, 2))}, jnp.asarray(ids)))
    want_txt = _torch_openai_clip_text(sd, ids, 2, 2).numpy()
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-5, atol=2e-5)


def test_clip_backbone_env_npz_loading(tmp_path, monkeypatch):
    """get_clip_backbone picks up ETA_TPU_CLIP_NPZ and produces finite,
    weight-dependent features at the ViT-B/16-shaped small config."""
    from eta_inversion_tpu.metrics.clip_similarity import get_clip_backbone

    rs = np.random.RandomState(5)
    sd = _rand_openai_clip_sd(rs, hidden=32, layers=1, patch=16, image=32,
                              proj=16, vocab=512)
    path = tmp_path / "clip.npz"
    np.savez(path, **sd)
    monkeypatch.setenv("ETA_TPU_CLIP_NPZ", str(path))
    bk = get_clip_backbone(image_size=32, hidden=32, layers=1, heads=2,
                           patch=16, text_hidden=32, text_layers=1,
                           text_heads=2, vocab_size=512, projection_dim=16)
    want = np.asarray(sd["visual.proj"], np.float32)
    np.testing.assert_array_equal(np.asarray(bk.vparams["visual_projection"]),
                                  want)
    f = np.asarray(bk.encode_image(jnp.asarray(rs.rand(1, 40, 40, 3),
                                               jnp.float32)))
    assert np.isfinite(f).all() and f.shape == (1, 16)


@pytest.mark.parametrize("layerscale", [False, True])
def test_dino_mapping_matches_torch(layerscale):
    from eta_inversion_tpu.models.backbone_weights import map_dino_vit, to_jax
    from eta_inversion_tpu.models.vit import ViT, ViTConfig

    rs = np.random.RandomState(7)
    sd = _rand_dino_sd(rs, layerscale=layerscale)
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                    num_heads=4, layerscale=layerscale)
    model = ViT(cfg)
    params = to_jax(map_dino_vit(sd, 2, layerscale=layerscale))
    pixels = rs.randn(1, 32, 32, 3).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(pixels)))
    got_keys = np.asarray(model.keys_at_layer(params, jnp.asarray(pixels), 1))
    want, want_keys = _torch_dino_forward(sd, _t(pixels).permute(0, 3, 1, 2),
                                          2, 4, layerscale)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_keys, want_keys.numpy(), rtol=2e-5, atol=2e-5)


def test_dino_metric_env_npz(tmp_path, monkeypatch):
    from eta_inversion_tpu.metrics.dino_vit_structure import DinoVitStructure

    rs = np.random.RandomState(9)
    sd = _rand_dino_sd(rs, hidden=32, layers=2, patch=8, image=32)
    path = tmp_path / "dino.npz"
    np.savez(path, **sd)
    monkeypatch.setenv("ETA_TPU_DINO_NPZ", str(path))
    m = DinoVitStructure(image_size=32, hidden=32, layers=2, heads=4)
    a = rs.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1
    b = np.clip(a + rs.randn(1, 16, 16, 3).astype(np.float32) * 0.3, -1, 1)
    same = float(np.asarray(m.forward(a, a)))
    diff = float(np.asarray(m.forward(b, a)))
    assert same == pytest.approx(0.0, abs=1e-9)
    assert diff > 0 and np.isfinite(diff)


def test_lpips_env_npz(tmp_path, monkeypatch):
    """ETA_TPU_LPIPS_NPZ is honored by load_lpips_params (flat flax paths,
    the layout tools/convert_weights.py `lpips` writes)."""
    import flax

    from eta_inversion_tpu.models.lpips import load_lpips_params

    _, rand_params = load_lpips_params()
    flat = {"/".join(k): np.asarray(v) for k, v in
            flax.traverse_util.flatten_dict(
                jax.tree_util.tree_map(np.asarray, rand_params)).items()}
    # perturb one lin weight so env-loading is observable
    flat["lin0"] = flat["lin0"] + 1.0
    path = tmp_path / "lpips.npz"
    np.savez(path, **flat)
    monkeypatch.setenv("ETA_TPU_LPIPS_NPZ", str(path))
    _, params = load_lpips_params()
    np.testing.assert_array_equal(np.asarray(params["lin0"]), flat["lin0"])
