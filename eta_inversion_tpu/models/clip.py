"""Flax CLIP text + vision towers.

Text tower: the SD conditioning encoder (CLIP ViT-L/14 text model, 77-token
context) the reference calls in `create_context`
(/root/reference/modules/inversion/diffusion_inversion.py:210-247); SD consumes
the final-LayerNorm hidden states.

Vision tower: used by the CLIP similarity metrics (ViT-B/16,
/root/reference/metrics/clip_similarity.py:160-278).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    # openai CLIP uses quick-gelu
    act: str = "quick_gelu"
    # SDXL convention: conditioning uses the PENULTIMATE layer's hidden states
    # (HF hidden_states[-2], before the final layer and final_layer_norm);
    # the final layer + norm still exist (and run for the pooled output)
    penultimate: bool = False
    # text_projection dim (CLIPTextModelWithProjection); with penultimate set
    # the encoder returns (penultimate_hidden, projected_pooled)
    projection_dim: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 512
    act: str = "quick_gelu"


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)  # HF 'gelu' is exact


class CLIPAttention(nn.Module):
    num_heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(mask[None, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(o)


class CLIPLayer(nn.Module):
    num_heads: int
    causal: bool
    act: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x).astype(self.dtype)
        x = x + CLIPAttention(self.num_heads, self.causal, self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(c * 4, dtype=self.dtype, name="fc1")(h)
        h = _act(self.act)(h)
        x = x + nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: (B, 77) int32 -> (B, 77, hidden) final hidden states.

        With cfg.penultimate, the conditioning output is the hidden state
        BEFORE the last layer (HF hidden_states[-2], un-normed — the SDXL
        convention); with cfg.projection_dim, additionally returns the
        projected pooled eos-token embedding from the FINAL normed states."""
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        penult = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penult = x
            x = CLIPLayer(cfg.num_heads, causal=True, act=cfg.act, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
        hidden = penult if cfg.penultimate else x
        if cfg.projection_dim is None:
            return hidden
        # pooled = eos-token row of the final normed states; our tokenizer
        # puts eot at the argmax id (openai CLIP convention)
        eos_pos = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.hidden_size, cfg.projection_dim))
        return hidden, pooled.astype(self.dtype) @ proj.astype(self.dtype)


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels, project: bool = True):
        """pixels: (B, H, W, 3) CLIP-normalized -> (B, projection_dim) embedding
        (or pooled hidden if project=False)."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embedding")(pixels.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(self.dtype), x], axis=1)
        npos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (npos, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layernorm")(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.num_heads, causal=False, act=cfg.act, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(x[:, 0])
        if not project:
            return pooled
        proj = self.param("visual_projection", nn.initializers.normal(0.02),
                          (cfg.hidden_size, cfg.projection_dim))
        return pooled.astype(self.dtype) @ proj.astype(self.dtype)


class CLIPTextProjector(nn.Module):
    """Text tower + pooled projection, for CLIP-score metrics (takes eos-token
    hidden state as the pooled output)."""

    config: CLIPTextConfig = CLIPTextConfig()
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, eos_token_id: Optional[int] = None):
        hidden = CLIPTextEncoder(self.config, self.dtype, name="text_model")(input_ids)
        if eos_token_id is None:
            # openai CLIP: argmax of ids = eot token (highest id)
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(hidden, eos_pos[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.config.hidden_size, self.projection_dim))
        return pooled.astype(self.dtype) @ proj.astype(self.dtype)
