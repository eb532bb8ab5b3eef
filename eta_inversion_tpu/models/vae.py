"""Flax AutoencoderKL (Stable Diffusion VAE), NHWC.

Counterpart of the diffusers VAE the reference uses for encode/decode with
scaling factor 0.18215 (/root/reference/modules/inversion/
diffusion_inversion.py:183-208; the reference takes the posterior *mean*, not a
sample, so encoding is deterministic).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ResnetBlock, Upsample


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid block."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                         name="group_norm")(x).astype(self.dtype)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        # dispatcher: Pallas flash kernel on TPU at 512px (S=4096, d=512 —
        # the XLA einsum path materializes a (B, 4096, 4096) fp32 score
        # tensor per einsum in the decoder's hot mid block)
        from ..ops.flash_attention import attention
        o = attention(q[:, None], k[:, None], v[:, None], c ** -0.5)[:, 0]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return residual + o.reshape(b, h, w, c)


class VAEDownsample(nn.Module):
    """Stride-2 conv with the VAE's asymmetric (0,1) padding."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = VAEDownsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                        name="mid_resnet_0")(x)
        x = VAEAttention(groups=g, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                        name="mid_resnet_1")(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                        name="mid_resnet_0")(x)
        x = VAEAttention(groups=g, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                        name="mid_resnet_1")(x)
        for up_i, stage in enumerate(reversed(range(len(cfg.block_out_channels)))):
            ch = cfg.block_out_channels[stage]
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, use_time_emb=False, groups=g, dtype=self.dtype,
                                name=f"up_{up_i}_resnet_{j}")(x)
            if stage > 0:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{up_i}_upsample")(x)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x):
        """(B,H,W,3) [-1,1] image -> (mean, logvar), each (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    def encode(self, x):
        """Deterministic encode to the posterior mean (reference semantics)."""
        mean, _ = self.encode_moments(x)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
