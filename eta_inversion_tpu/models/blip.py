"""Flax BLIP image captioner: ViT vision encoder + BERT-style text decoder.

Counterpart of the reference's two BLIP call sites:
  * pix2pix-zero invert-prompt captioning (/root/reference/modules/editing/
    pix2pix_zero.py:243-297 — HF Salesforce/blip-image-captioning-base with the
    prompt "a photography of", which stays in the returned caption);
  * the clip_text_text metric's caption generator (/root/reference/metrics/
    clip_similarity.py:128-157 — LAVIS blip_caption base_coco, whose prompt
    "a picture of " is stripped from the returned caption).

Architecture mirrors BlipForConditionalGeneration: a pre-LN ViT-B/16 tower and
a 12-layer post-LN BERT decoder with causal self-attention, cross-attention
over the image tokens, and an LM head tied to the word embedding.  Weights
load from a local .npz (flat {"path/to/param": array}) when available; offline
(zero egress) the captioner runs deterministic random init — captions are then
self-consistent token strings, not English, exactly like the other offline
metric backbones (CLIP/DINO/LPIPS).  Greedy decode runs as one jitted
`lax.while_loop` with a fixed-size token buffer (static shapes for XLA).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIPLayer
from .tokenizer import TokenizerBase, load_wordpiece_tokenizer

BLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
BLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524         # BERT-base vocab + [DEC]/[ENC]
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 512
    encoder_width: int = 768        # vision hidden size (cross-attn k/v dim)
    bos_token_id: int = 30522       # [DEC]
    sep_token_id: int = 102         # [SEP] ends generation
    pad_token_id: int = 0


class BlipVisionEncoder(nn.Module):
    """Pre-LN ViT (BLIP's vision tower); returns all patch-token hiddens."""

    config: BlipVisionConfig = BlipVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
                    name="patch_embedding")(pixels.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(self.dtype), x],
            axis=1)
        npos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (npos, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.num_heads, causal=False, act="gelu",
                          dtype=self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            name="post_layernorm")(x)


class _BertAttention(nn.Module):
    """BERT attention (self or cross), post-LN residual."""

    num_heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None):
        b, s, c = x.shape
        kv = x if kv is None else kv
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(kv)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(kv)
        t = kv.shape[1]
        q = q.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((s, t), dtype=bool))
            logits = jnp.where(mask[None, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
        o = nn.Dense(c, dtype=self.dtype, name="out_proj")(o)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            name="layer_norm")(x + o)


class _BertLayer(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc):
        c = x.shape[-1]
        x = _BertAttention(self.num_heads, causal=True, dtype=self.dtype,
                           name="self_attn")(x)
        x = _BertAttention(self.num_heads, causal=False, dtype=self.dtype,
                           name="cross_attn")(x, enc)
        h = nn.Dense(c * 4, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)  # HF BERT/BLIP: exact gelu
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            name="output_layer_norm")(x + h)


class BlipTextDecoder(nn.Module):
    """BERT-style causal decoder with cross-attention; LM head tied to the
    word embedding (+ free bias), as in BlipForConditionalGeneration."""

    config: BlipTextConfig = BlipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, encoder_hidden):
        cfg = self.config
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="word_embedding")
        x = embed(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="embed_layer_norm")(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = _BertLayer(cfg.num_heads, dtype=self.dtype,
                           name=f"layers_{i}")(x, encoder_hidden)
        # LM head: transform (dense+gelu+LN) then tied decoder
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="head_transform")(x)
        h = nn.gelu(h, approximate=False)  # HF BERT/BLIP: exact gelu
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="head_layer_norm")(h)
        logits = embed.attend(h.astype(self.dtype))
        bias = self.param("head_bias", nn.initializers.zeros, (cfg.vocab_size,))
        return logits + bias


class BlipCaptioner:
    """Vision tower + decoder + greedy decode, behind the framework's standard
    offline-weights discipline (.npz or deterministic random init)."""

    def __init__(self, vision_cfg: BlipVisionConfig, text_cfg: BlipTextConfig,
                 tokenizer: Optional[TokenizerBase] = None,
                 weights_path: Optional[str] = None, seed: int = 13,
                 max_new_tokens: int = 24):
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.vision = BlipVisionEncoder(vision_cfg)
        self.decoder = BlipTextDecoder(text_cfg)
        self.tokenizer = tokenizer or load_wordpiece_tokenizer(
            None, vocab_size=text_cfg.vocab_size)
        self.max_new_tokens = max_new_tokens

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        sz = vision_cfg.image_size
        self.vparams = jax.jit(lambda k: self.vision.init(
            k, jnp.zeros((1, sz, sz, 3)))["params"])(k1)
        ntok = (sz // vision_cfg.patch_size) ** 2 + 1
        self.tparams = jax.jit(lambda k: self.decoder.init(
            k, jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, ntok, vision_cfg.hidden_size)))["params"])(k2)
        if weights_path and os.path.exists(weights_path):
            import flax

            flat = dict(np.load(weights_path))
            tree = flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
            self.vparams = tree["vision"]
            self.tparams = tree["text"]

        # one jitted greedy-decode program (params as arguments; fixed-size
        # token buffer so every iteration has static shapes)
        @functools.partial(jax.jit, static_argnums=(4,))
        def _generate(vparams, tparams, pixels, prompt_ids, prompt_len):
            feats = self.vision.apply({"params": vparams}, pixels)
            b = pixels.shape[0]
            L = prompt_len + self.max_new_tokens
            ids0 = jnp.full((b, L), text_cfg.pad_token_id, jnp.int32)
            ids0 = ids0.at[:, :prompt_len].set(prompt_ids[None])

            def cond(state):
                ids, cur, done = state
                return (cur < L) & ~jnp.all(done)

            def body(state):
                ids, cur, done = state
                logits = self.decoder.apply({"params": tparams}, ids, feats)
                nxt = jnp.argmax(logits[:, cur - 1], axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, text_cfg.pad_token_id, nxt)
                ids = jax.lax.dynamic_update_slice_in_dim(
                    ids, nxt[:, None], cur, axis=1)
                done = done | (nxt == text_cfg.sep_token_id)
                return ids, cur + 1, done

            ids, _, _ = jax.lax.while_loop(
                cond, body, (ids0, jnp.asarray(prompt_len), jnp.zeros(b, bool)))
            return ids

        self._generate = _generate

    def preprocess(self, images) -> jnp.ndarray:
        """NHWC [-1,1] -> resized, BLIP-normalized pixels."""
        x = jnp.asarray(images, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        x = (x + 1.0) / 2.0
        sz = self.vision_cfg.image_size
        x = jax.image.resize(x, (x.shape[0], sz, sz, 3), method="bilinear")
        return (jnp.clip(x, 0, 1) - BLIP_MEAN) / BLIP_STD

    def caption(self, images, prompt: str = "a picture of",
                include_prompt: bool = False) -> List[str]:
        """Greedy captions for a batch of [-1,1] NHWC images.

        `include_prompt=True` matches the HF generate() convention the
        reference's pix2pix-zero uses (prompt text stays in the caption);
        False matches LAVIS's blip_caption (prompt stripped)."""
        tok = self.tokenizer
        prompt_ids = [self.text_cfg.bos_token_id] + tok.encode(prompt)
        ids = self._generate(self.vparams, self.tparams, self.preprocess(images),
                             jnp.asarray(prompt_ids, jnp.int32), len(prompt_ids))
        ids = np.asarray(ids)
        out = []
        start = 1 if include_prompt else len(prompt_ids)
        specials = {self.text_cfg.bos_token_id, self.text_cfg.sep_token_id,
                    self.text_cfg.pad_token_id}
        for row in ids:
            toks = [int(t) for t in row[start:] if int(t) not in specials]
            text = tok.decode(toks)
            out.append((prompt + " " + text).strip() if include_prompt else text)
        return out

    def __call__(self, image) -> str:
        """caption_fn interface: one image -> one caption (HF convention,
        reference pix2pix_zero.py:273-297)."""
        return self.caption(image, prompt="a photography of",
                            include_prompt=True)[0]


_PRESETS = {
    "base": (BlipVisionConfig(), BlipTextConfig()),
    "tiny": (BlipVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                              num_layers=2, num_heads=2),
             BlipTextConfig(vocab_size=128, hidden_size=32, num_layers=2,
                            num_heads=2, max_positions=64, encoder_width=32,
                            bos_token_id=126, sep_token_id=125, pad_token_id=0)),
}


@functools.lru_cache(maxsize=2)
def get_blip_captioner(preset: str = "base",
                       weights_path: Optional[str] = None) -> BlipCaptioner:
    """Cached captioner; preset "tiny" for tests, "base" = BLIP-base."""
    if preset not in _PRESETS:
        raise ValueError(f"unknown BLIP preset {preset!r}; have {sorted(_PRESETS)}")
    vcfg, tcfg = _PRESETS[preset]
    weights_path = weights_path or os.environ.get("BLIP_WEIGHTS")
    tok = load_wordpiece_tokenizer(os.environ.get("BLIP_VOCAB"),
                                   vocab_size=tcfg.vocab_size,
                                   specials=(tcfg.pad_token_id, tcfg.bos_token_id,
                                             tcfg.sep_token_id))
    return BlipCaptioner(vcfg, tcfg, tokenizer=tok, weights_path=weights_path,
                         max_new_tokens=8 if preset == "tiny" else 24)


def captioner_preset_for_model(model_name: str) -> str:
    """Pick the BLIP preset matching a diffusion-model preset (tiny test
    models get the tiny captioner so tests stay fast)."""
    return "tiny" if model_name == "tiny" else "base"
