"""Model-layer tests: UNet/VAE/CLIP shapes, attention metadata topology,
hook-driven attention stores, tokenizer contract."""

import jax.numpy as jnp
import numpy as np

from eta_inversion_tpu.models.tokenizer import HashTokenizer
from eta_inversion_tpu.models.unet import UNetConfig, build_attn_metas
from eta_inversion_tpu.ops.attn_ctrl import AttnHooks


def test_sd15_attn_topology():
    """SD-1.5 UNet must have exactly 32 attention layers (reference asserts
    this at /root/reference/modules/utils/ptp_utils.py:299) with the expected
    place/resolution layout."""
    metas = build_attn_metas(UNetConfig())
    flat = [m for pair in metas.values() for m in pair]
    assert len(flat) == 32
    assert sum(m.is_cross for m in flat) == 16
    per_place = {}
    for m in flat:
        per_place[m.place] = per_place.get(m.place, 0) + 1
    assert per_place == {"down": 12, "mid": 2, "up": 18}
    # self-attention forward-order numbering: up blocks start at index 7
    self_layers = sorted((m for m in flat if not m.is_cross), key=lambda m: m.self_idx)
    assert [m.place for m in self_layers][:7] == ["down"] * 6 + ["mid"]
    assert all(m.place == "up" for m in self_layers[7:])
    # resolutions: down 64,64,32,32,16,16; mid 8; up 16,16,16,32,32,32,64,64,64
    assert [m.res for m in self_layers] == [64, 64, 32, 32, 16, 16, 8,
                                            16, 16, 16, 32, 32, 32, 64, 64, 64]


def test_unet_forward_and_store(tiny_model):
    model = tiny_model
    z = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, 32))
    eps = model.apply_unet(z, 10, ctx)
    assert eps.shape == (2, 8, 8, 4)

    class StoreAll(AttnHooks):
        def store(self, meta):
            return meta.is_cross

    eps2, store = model.apply_unet(z, 10, ctx, hooks=StoreAll(), collect_store=True)
    # tiny config: cross layers = down_0 (1) + mid (1) + up_1 (2) = 4
    assert len(store) == 4
    for k, v in store.items():
        assert v.ndim == 4 and v.shape[0] == 2 and v.shape[-1] == 77, (k, v.shape)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), rtol=1e-5, atol=1e-5)


def test_vae_roundtrip_shapes(tiny_model, test_image):
    z = tiny_model.vae_encode(jnp.asarray(test_image))
    assert z.shape == (1, 8, 8, 4)
    img = tiny_model.vae_decode(z)
    assert img.shape == (1, 16, 16, 3)


def test_text_encoder_causality(tiny_model):
    """Changing a later token must not affect earlier hidden states (causal
    mask), and the encoder must be deterministic."""
    tok = tiny_model.tokenizer
    ids1 = tok(["a cat sitting"])
    ids2 = ids1.copy()
    ids2[0, 10] = 7  # mutate a padding-region token
    h1 = np.asarray(tiny_model.encode_text(ids1))
    h2 = np.asarray(tiny_model.encode_text(ids2))
    np.testing.assert_allclose(h1[0, :10], h2[0, :10], rtol=1e-5, atol=1e-5)
    assert not np.allclose(h1[0, 10:], h2[0, 10:])


def test_clip_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    """Exercise the real BPE path with a miniature vocab/merges pair."""
    import json

    from eta_inversion_tpu.models.tokenizer import ClipBpeTokenizer

    # byte-level alphabet + a few merges building "cat</w>" and "at</w>"
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz ":
        vocab[ch] = len(vocab)
    for tok in ["t</w>", "at</w>", "cat</w>", "a</w>", "ca"]:
        vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    merges = ["t </w>", "a t</w>", "c at</w>", "a </w>", "c a"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\n" + "\n".join(merges) + "\n")

    tok = ClipBpeTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ids = tok.encode("a cat")
    # "a" -> a</w>; "cat" -> merges to cat</w>
    assert ids == [vocab["a</w>"], vocab["cat</w>"]]
    assert tok.decode(ids) == "a cat"
    batch = tok(["A Cat"])  # lowercasing + whitespace cleanup
    assert batch[0, 0] == tok.bos_token_id
    assert list(batch[0, 1:3]) == ids
    assert batch[0, 3] == tok.eos_token_id
    # unknown-word path: "bat" falls back through merges ("at</w>" exists)
    ids2 = tok.encode("bat")
    assert ids2 == [vocab["b"], vocab["at</w>"]]


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=1024)
    ids = tok(["a cat", "a cat sitting next to a mirror"])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos_token_id
    assert ids[0, 3] == tok.eos_token_id  # bos + 2 words + eos
    assert (ids[0, 4:] == tok.pad_token_id).all()
    # same word -> same id, stable across calls
    assert tok.encode("cat") == tok.encode("cat")
    assert tok.encode("a cat")[0] == tok.encode("a dog")[0]


def test_cfg_shared_prefix_matches_duplicated(tiny_model):
    """UNet with cfg_shared_prefix must equal explicitly duplicated rows."""
    import jax.numpy as jnp
    import numpy as np

    rs = np.random.RandomState(7)
    m = tiny_model
    s = m.latent_size
    lat = jnp.asarray(rs.randn(2, s, s, m.latent_channels), jnp.float32)
    ctx = jnp.asarray(rs.randn(4, 77, m.preset.unet.cross_attention_dim),
                      jnp.float32)
    dup = m.unet.apply({"params": m.params["unet"]},
                       jnp.concatenate([lat, lat], 0), 500, ctx)
    shared = m.unet.apply({"params": m.params["unet"]}, lat, 500, ctx,
                          cfg_shared_prefix=True)
    # not bitwise: XLA tiles batch-2 and batch-4 reductions differently
    np.testing.assert_allclose(np.asarray(dup), np.asarray(shared),
                               rtol=1e-3, atol=1e-5)


def test_gelu_exact_f32_identity_and_bf16_accuracy():
    """gelu_exact: f32 path IS jax.nn.gelu(approximate=False) bit-for-bit;
    the bf16 path's polynomial erf stays within 2e-4 absolute of the true
    erf-gelu (evaluated in f64 on the bf16-rounded inputs) — below the bf16
    rounding noise of the GEGLU product it feeds (models/attention.py)."""
    import math

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from eta_inversion_tpu.models.layers import gelu_exact

    x = np.linspace(-9.0, 9.0, 100001).astype(np.float32)
    got32 = np.asarray(gelu_exact(jnp.asarray(x)))
    want32 = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    assert np.array_equal(got32, want32)

    xb = jnp.asarray(x, jnp.bfloat16)
    seen = np.asarray(xb.astype(jnp.float32)).astype(np.float64)
    exact = np.vectorize(
        lambda v: 0.5 * v * (1.0 + math.erf(v / math.sqrt(2.0))))(seen)
    got16 = np.asarray(gelu_exact(xb).astype(jnp.float32)).astype(np.float64)
    # tolerance = polynomial error (2e-4 abs) + bf16 output rounding (2^-8 rel)
    assert np.all(np.abs(got16 - exact) <= 2e-4 + np.abs(exact) * 2.0 ** -8)


def test_sd21_attn_topology():
    """SD-2.1 (second model family): same 32-layer attention topology as
    SD-1.5 but SD2.x head geometry — fixed head_dim 64, so the head COUNT
    varies per stage (320/640/1280 channels -> 5/10/20 heads; diffusers
    `attention_head_dim=[5, 10, 20, 20]` for stabilityai/stable-diffusion-2-1)."""
    from eta_inversion_tpu.models import SD21

    metas = build_attn_metas(SD21.unet)
    flat = [m for pair in metas.values() for m in pair]
    assert len(flat) == 32 and sum(m.is_cross for m in flat) == 16
    heads_by_res = {m.res: m.heads for m in flat}
    assert heads_by_res == {64: 5, 32: 10, 16: 20, 8: 20}
    assert SD21.unet.cross_attention_dim == 1024
    assert SD21.text.hidden_size == 1024 and SD21.text.num_layers == 23


def test_tiny21_unet_forward_and_store(tiny21_model):
    """The SD2.x code paths (linear proj_in/out, per-stage heads) produce
    correct shapes, and hook stores carry the per-layer head counts."""
    model = tiny21_model
    z = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, 32))
    eps = model.apply_unet(z, 10, ctx)
    assert eps.shape == (2, 8, 8, 4)

    class StoreAll(AttnHooks):
        def store(self, meta):
            return meta.is_cross

    eps2, store = model.apply_unet(z, 10, ctx, hooks=StoreAll(), collect_store=True)
    heads_by_key = {m.store_key: m.heads
                    for pair in model.attn_metas.values() for m in pair}
    assert len(store) == 4
    for k, v in store.items():
        # (B, H, S, 77) with the per-layer head count (2 at ch32, 4 at ch64)
        assert v.shape[1] == heads_by_key[k], (k, v.shape)
        assert v.shape[0] == 2 and v.shape[-1] == 77
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), rtol=1e-5, atol=1e-5)


def test_sdxl_attn_topology():
    """SDXL (third model family): 3-stage UNet with per-stage transformer
    DEPTH (1/2/10 — diffusers `transformer_depth=[1, 2, 10]` for
    stabilityai/stable-diffusion-xl-base-1.0) -> 70 transformer blocks = 140
    attention layers; no attention at full res; 2048-d dual-tower context."""
    from eta_inversion_tpu.models import SDXL

    metas = build_attn_metas(SDXL.unet)
    flat = sorted((m for pair in metas.values() for m in pair),
                  key=lambda m: m.idx)
    assert len(flat) == 140 and sum(m.is_cross for m in flat) == 70
    # fixed head_dim 64: 640ch -> 10 heads at 64x64, 1280ch -> 20 at 32x32
    assert {m.res: m.heads for m in flat} == {64: 10, 32: 20}
    # store keys (idx-suffixed) stay globally unique across depth>1 blocks
    assert len({m.store_key for m in flat}) == 140
    # metas are emitted in forward-execution order with consecutive idx
    assert [m.idx for m in flat] == list(range(140))
    assert SDXL.unet.cross_attention_dim == 2048
    assert SDXL.text.hidden_size + SDXL.text2.hidden_size == 2048
    assert SDXL.text.penultimate and SDXL.text2.projection_dim == 1280
    assert SDXL.vae.scaling_factor == 0.13025


def test_tinyxl_unet_forward_and_store(tinyxl_model):
    """SDXL code paths (depth-2 transformers, added-cond embedding, packed
    dual-tower context): shapes are right and depth>1 blocks sow under
    distinct store keys."""
    model = tinyxl_model
    ctx1 = model.encode_text(model.tokenizer(["a cat"]))
    assert ctx1.shape == (1, 78, 32)  # 77 tokens + packed (pooled, time_ids) row
    ctx = jnp.tile(ctx1, (2, 1, 1))
    z = jnp.zeros((2, 8, 8, 4))
    eps = model.apply_unet(z, 10, ctx)
    assert eps.shape == (2, 8, 8, 4)

    class StoreAll(AttnHooks):
        def store(self, meta):
            return meta.is_cross

    eps2, store = model.apply_unet(z, 10, ctx, hooks=StoreAll(),
                                   collect_store=True)
    cross = [m for pair in model.attn_metas.values() for m in pair if m.is_cross]
    assert set(store) == {m.store_key for m in cross} and len(store) == len(cross)
    for v in store.values():
        # cross-attention runs on the 77 sliced tokens, not the packed row
        assert v.shape[-1] == 77
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), rtol=1e-5,
                               atol=1e-5)
    # the added-cond row must influence the prediction (pooled conditioning)
    ctx_zero_row = ctx.at[:, 77].set(0.0)
    eps3 = model.apply_unet(z, 10, ctx_zero_row)
    assert float(jnp.abs(eps - eps3).max()) > 1e-6


def test_bf16_load_stores_params_in_compute_dtype():
    """dtype="bfloat16" must STORE params bf16 (flax would otherwise keep
    param_dtype fp32 and cast at every op — numerically identical but double
    the param HBM; SDXL fp32 params alone are 14 GB on a 16 GB chip), while
    the fp32 default keeps fp32 exactly.  Integer leaves (e.g. position ids)
    stay integral."""
    import jax

    from eta_inversion_tpu.models import load_diffusion_model

    m16, _ = load_diffusion_model("tiny", dtype="bfloat16", seed=7)
    dts = {str(l.dtype) for l in jax.tree.leaves(m16.params)}
    assert "float32" not in dts, dts
    assert "bfloat16" in dts

    m32, _ = load_diffusion_model("tiny", seed=7)
    assert {str(l.dtype) for l in jax.tree.leaves(m32.params)
            if str(l.dtype).startswith("float")} == {"float32"}
