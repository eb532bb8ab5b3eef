"""Flax UNet2DCondition (Stable Diffusion 1.x architecture), NHWC, hook-aware.

Architecture parity target: the diffusers UNet the reference loads
(/root/reference/modules/models/__init__.py:104-138) — 4 down stages
(320/640/1280/1280, cross-attention on the first three), mid block, 4 up stages,
32 attention layers total (asserted by the reference at
/root/reference/modules/utils/ptp_utils.py:299).

TPU-native choices: channels-last layout, attention via Pallas flash kernels
with functional hooks (ops/attn_ctrl.py), fp32 GroupNorm/LayerNorm with a
configurable compute dtype (bf16 for speed), and static layer metadata so
editing interventions compile into the graph.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta, ResnetMeta
from .attention import Transformer2D
from .layers import Downsample, ResnetBlock, TimestepEmbedding, Upsample, timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_heads: int = 8
    # SD2.x convention: fixed per-head width, head COUNT varies per stage
    # (ch // head_dim); when set, `num_heads` is ignored.  SD1.x (None) fixes
    # the head count instead (diffusers' scalar-vs-list `attention_head_dim`).
    head_dim: Optional[int] = None
    # SD2.x Transformer2D uses nn.Linear proj_in/out on the flattened tokens
    # instead of 1x1 convs (diffusers `use_linear_projection`)
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    # which down stages carry cross-attention transformers (SD1.x: all but last)
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    # SDXL convention: per-stage transformer DEPTH (BasicTransformerBlock count
    # per Transformer2D; the mid block uses the last entry).  None = depth 1
    # everywhere (SD1.x/SD2.x).
    transformer_depth: Optional[Tuple[int, ...]] = None
    # SDXL `addition_embed_type="text_time"`: the time embedding is augmented
    # with a projection of [pooled text embedding; sinusoidal micro-cond ids].
    # The engine packs (pooled, time_ids) into context row `context_tokens`
    # (see models/__init__.py DiffusionModel.text_context_fn).
    addition_embed: bool = False
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280
    context_tokens: int = 77  # cross-attention rows of the packed context

    @property
    def num_stages(self) -> int:
        return len(self.block_out_channels)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_for(self, ch: int) -> int:
        if self.head_dim is not None:
            assert ch % self.head_dim == 0, (ch, self.head_dim)
            return ch // self.head_dim
        return self.num_heads

    def depth_for(self, stage: int) -> int:
        if self.transformer_depth is None:
            return 1
        return self.transformer_depth[stage]


def build_attn_metas(config: UNetConfig) -> Dict[str, Tuple[AttnLayerMeta, ...]]:
    """Static attention-layer metadata in forward-execution order.

    Keys: f"down_{i}_{j}", "mid", f"up_{i}_{j}" — one entry per Transformer2D,
    holding a flat (self, cross) meta pair per inner transformer block:
    depth 1 (SD1.x/2.x) gives 2 metas, SDXL depth-10 stages give 20.
    Self-attention layer numbering matches the reference's masactrl convention
    (16 self layers on SD1.x; up blocks start at index 7,
    /root/reference/modules/utils/masactrl.py:20-39).
    """
    metas: Dict[str, Tuple[AttnLayerMeta, ...]] = {}
    idx = 0
    self_idx = 0
    cross_idx = 0

    def add(key: str, place: str, res: int, heads: int, depth: int):
        nonlocal idx, self_idx, cross_idx
        ms = []
        for _ in range(depth):
            ms.append(AttnLayerMeta(idx, False, place, res, self_idx, -1, heads))
            idx += 1
            ms.append(AttnLayerMeta(idx, True, place, res, -1, cross_idx, heads))
            idx += 1
            self_idx += 1
            cross_idx += 1
        metas[key] = tuple(ms)

    res = config.sample_size
    for i in range(config.num_stages):
        if config.attn_down[i]:
            for j in range(config.layers_per_block):
                add(f"down_{i}_{j}", "down", res,
                    config.heads_for(config.block_out_channels[i]),
                    config.depth_for(i))
        if i < config.num_stages - 1:
            res //= 2
    add("mid", "mid", res, config.heads_for(config.block_out_channels[-1]),
        config.depth_for(config.num_stages - 1))
    for i in reversed(range(config.num_stages)):
        if config.attn_down[i]:
            for j in range(config.layers_per_block + 1):
                # up block numbering in module tree is reversed stage order
                add(f"up_{config.num_stages - 1 - i}_{j}", "up", res,
                    config.heads_for(config.block_out_channels[i]),
                    config.depth_for(i))
        if i > 0:
            res *= 2
    return metas


class UNet2DCondition(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 hooks: Optional[AttnHooks] = None,
                 cfg_shared_prefix: bool = False):
        """sample: (B, H, W, 4) NHWC latent; timesteps: scalar or (B,);
        encoder_hidden_states: (B, 77, cross_attention_dim).

        cfg_shared_prefix: sample carries B rows but encoder_hidden_states
        carries 2B ([u_1..u_B, c_1..c_B]) — the classifier-free-guidance
        halves share the latent, so the prefix up to the first
        cross-attention runs once and the hidden states are tiled there
        (exact dedup; the caller must ensure the prefix is hook-free,
        AttnHooks.cfg_prefix_safe)."""
        cfg = self.config
        metas = build_attn_metas(cfg)
        if cfg.addition_embed:
            # SDXL text_time conditioning: the engine packs the pooled text
            # embedding and the 6 micro-conditioning ids into one extra
            # context row (models/__init__.py text_context_fn); rows beyond
            # context_tokens never reach cross-attention.
            assert not cfg_shared_prefix, \
                "added-cond rows differ before the first cross-attention"
            assert encoder_hidden_states.shape[0] == sample.shape[0]
            # JAX clamps out-of-bounds indices, so an unpacked (B, 77, D)
            # context would silently misread the last token as [pooled;ids]
            assert encoder_hidden_states.shape[1] == cfg.context_tokens + 1, (
                f"addition_embed expects a packed context with one extra row "
                f"({cfg.context_tokens}+1 tokens; see text_context_fn), got "
                f"{encoder_hidden_states.shape[1]}")
            add_row = encoder_hidden_states[:, cfg.context_tokens]
            ctx = encoder_hidden_states[:, :cfg.context_tokens].astype(self.dtype)
            pooled = add_row[:, :cfg.addition_pooled_dim]
            time_ids = add_row[:, cfg.addition_pooled_dim:cfg.addition_pooled_dim + 6]
        else:
            ctx = encoder_hidden_states.astype(self.dtype)

        t = jnp.asarray(timesteps)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (sample.shape[0],))
        temb = timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.time_embed_dim, self.dtype, name="time_embedding")(
            temb.astype(self.dtype))
        if cfg.addition_embed:
            # diffusers UNet2DConditionModel text_time path: sinusoidal embed
            # of each of the 6 ids (same flip_sin_to_cos=True, shift=0 table
            # as the main timestep), concatenated after the pooled embedding
            b = time_ids.shape[0]
            t_add = timestep_embedding(time_ids.reshape(-1).astype(jnp.float32),
                                       cfg.addition_time_embed_dim)
            aug = jnp.concatenate(
                [pooled.astype(jnp.float32), t_add.reshape(b, -1)], axis=-1)
            temb = temb + TimestepEmbedding(cfg.time_embed_dim, self.dtype,
                                            name="add_embedding")(
                aug.astype(self.dtype))

        x = sample.astype(self.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)

        dup_pending = cfg_shared_prefix

        def transformer(key: str, x, name: str):
            nonlocal dup_pending, temb
            ms = metas[key]
            ch = x.shape[-1]
            dup = dup_pending
            dup_pending = False
            heads = cfg.heads_for(ch)
            x = Transformer2D(heads, ch // heads, ms[0], ms[1],
                              depth=len(ms) // 2,
                              extra_metas=tuple((ms[2 * d], ms[2 * d + 1])
                                                for d in range(1, len(ms) // 2)),
                              groups=cfg.norm_num_groups, dtype=self.dtype,
                              use_linear=cfg.use_linear_projection,
                              name=name)(x, ctx, hooks, dup=dup)
            if temb.shape[0] != x.shape[0]:
                temb = jnp.tile(temb, (x.shape[0] // temb.shape[0], 1))
            return x

        # ---- down path -------------------------------------------------------
        skips: List[jnp.ndarray] = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x, temb)
                if cfg.attn_down[i]:
                    x = transformer(f"down_{i}_{j}", x, f"down_{i}_attn_{j}")
                skips.append(x)
            if i < cfg.num_stages - 1:
                x = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid -------------------------------------------------------------
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_resnet_0")(x, temb)
        x = transformer("mid", x, "mid_attn")
        x = ResnetBlock(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_resnet_1")(x, temb)

        # ---- up path ---------------------------------------------------------
        for up_i, stage in enumerate(reversed(range(cfg.num_stages))):
            ch = cfg.block_out_channels[stage]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                if skip.shape[0] != x.shape[0]:
                    # skip saved before the CFG shared-prefix duplication
                    skip = jnp.tile(skip, (x.shape[0] // skip.shape[0], 1, 1, 1))
                split_at = x.shape[-1]
                x = jnp.concatenate([x, skip], axis=-1)
                rmeta = ResnetMeta(up_i, j, x.shape[1])
                inner = (lambda h, m=rmeta: hooks.resnet(m, h)) if hooks is not None else None
                x = ResnetBlock(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                                split_in=split_at,
                                name=f"up_{up_i}_resnet_{j}")(x, temb, inner_hook=inner)
                if cfg.attn_down[stage]:
                    x = transformer(f"up_{up_i}_{j}", x, f"up_{up_i}_attn_{j}")
            if stage > 0:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{up_i}_upsample")(x)

        if dup_pending:  # config without any attention: duplicate at the end
            x = jnp.tile(x, (2, 1, 1, 1))
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_out")(x)
        return x
