"""Generic ViT tower (DINO/DINOv2-style) with attention-key extraction.

Used by the DINO-ViT structure metric
(/root/reference/metrics/dino_vit_structure.py, Splice-style): the metric needs
the attention *keys* of a late transformer block, so the forward pass can
return per-layer key tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 8
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    # DINOv2 blocks scale the attention/MLP residual branches by learned
    # per-channel gammas (LayerScale); DINO v1 has none
    layerscale: bool = False


DINO_VITB8 = ViTConfig(patch_size=8)
DINOV2_VITB14 = ViTConfig(patch_size=14, layerscale=True)


class ViTBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    layerscale: bool = False

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        hd = c // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # expose keys for the structure metric
        self.sow("vit_keys", "k", k, init_fn=lambda: 0.0, reduce_fn=lambda a, b_: b_)
        q = q.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        if self.layerscale:
            o = o * self.param("ls1_gamma", nn.initializers.ones, (c,))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # timm/DINO ViT uses exact gelu
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        if self.layerscale:
            h = h * self.param("ls2_gamma", nn.initializers.ones, (c,))
        return x + h


class ViT(nn.Module):
    config: ViTConfig = DINO_VITB8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) imagenet-normalized. Returns final hidden
        states; per-layer keys available via the "vit_keys" collection."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=self.dtype,
                    name="patch_embed")(pixels.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(self.dtype), x], axis=1)
        npos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (npos, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg.num_heads, self.dtype, layerscale=cfg.layerscale,
                         name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

    def keys_at_layer(self, params, pixels, layer: int) -> jnp.ndarray:
        """Attention keys (B, tokens, hidden) of transformer block `layer`."""
        _, vars_ = self.apply({"params": params}, pixels, mutable=["vit_keys"])
        return vars_["vit_keys"][f"blocks_{layer}"]["k"]
