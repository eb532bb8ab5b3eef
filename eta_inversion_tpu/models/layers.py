"""Shared Flax building blocks for the diffusion models (NHWC, TPU-native).

Counterparts of the torch/diffusers blocks used by the reference pipeline
(/root/reference/modules/models/__init__.py:104-138 loads diffusers' UNet/VAE).
Everything is channels-last, GroupNorm(32)/SiLU, with module names chosen to
make the diffusers safetensors key mapping mechanical (see models/weights.py).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) gelu, matching torch F.gelu / diffusers' default.

    For float32 inputs this is jax.nn.gelu(approximate=False) verbatim (the
    torch crosschecks pin it at 2e-5).  For bf16/fp16 the erf is evaluated
    with a pure-FMA odd polynomial instead of lax.erf: lax.erf's large-|x|
    branch carries exp/select, which XLA refuses to fuse into a matmul
    epilogue — in the SD UNet's GEGLU that forced the full 2x-wide projection
    tensor to rematerialize through HBM and made ff/proj_out HBM-bound
    (measured +14 ms/step at batch 32 on v5e; see ROADMAP round-3 notes).
    The polynomial (ops/geglu.py ERF_COEF) fuses; abs err <= 2e-4, below
    bf16 noise.
    """
    if x.dtype not in (jnp.bfloat16, jnp.float16):
        return nn.gelu(x, approximate=False)
    from ..ops.geglu import gelu_poly_f32

    return gelu_poly_f32(x.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(t, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0,
                       max_period: float = 10000.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding semantics;
    SD uses flip_sin_to_cos=True, downscale_freq_shift=0)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """MLP lifting the sinusoidal embedding to the UNet time channel count."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class _SplitConcatConv(nn.Module):
    """3x3 conv over a channel-concatenated input, computed as two convs on
    the original operands summed: conv(cat(a, b), W) == conv(a, W[:, :, :ca])
    + conv(b, W[:, :, ca:]).  XLA's fused concat+conv runs the up-path skip
    convs at ~121 TF/s on v5e; the split form measured ~17% faster
    (scripts mb8).  Parameter tree (kernel/bias names, shapes, init stream)
    is identical to nn.Conv, so checkpoints and the HF weight mapping are
    unaffected."""

    features: int
    split: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))

        def conv(inp, w):
            return jax.lax.conv_general_dilated(
                inp, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        y = conv(x[..., : self.split], k[:, :, : self.split]) + \
            conv(x[..., self.split:], k[:, :, self.split:])
        return y + bias.astype(self.dtype)


class ResnetBlock(nn.Module):
    """GN-SiLU-Conv residual block with optional timestep conditioning."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    split_in: int = 0  # >0: conv1 input is cat(x, skip) split at this channel

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None, inner_hook=None):
        """`inner_hook` (h -> h) runs on the conv2 output *before* the residual
        add — the site where plug-and-play injects source features
        (/root/reference/modules/utils/pnp_utils.py:173-178)."""
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        if 0 < self.split_in < in_ch:
            h = _SplitConcatConv(self.out_channels, self.split_in, self.dtype,
                                 name="conv1")(h)
        else:
            h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            temb_p = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb_p[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        if inner_hook is not None:
            h = inner_hook(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # nearest-neighbor 2x upsample; jnp.repeat lowers to a cheap broadcast
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)
