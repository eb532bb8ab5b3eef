"""UNet attention modules with functional intervention hooks.

Counterpart of diffusers `Transformer2DModel`/`BasicTransformerBlock`/`Attention`
as exercised by the reference's patched forward
(/root/reference/modules/utils/ptp_utils.py:196-302).  Differences by design:

  * hooks are explicit arguments (see ops/attn_ctrl.py), not monkey-patches;
  * the probability tensor is only materialized when a hook requires it; large
    self-attention goes through the Pallas flash kernel (ops/flash_attention.py);
  * layouts are NHWC / (B, H, S, D), softmax in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta
from ..ops.flash_attention import attention, attention_packed, attention_probs
from ..ops.geglu import geglu_mlp


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int
    head_dim: int
    meta: AttnLayerMeta
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, hooks: Optional[AttnHooks] = None):
        b, s, _ = x.shape
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        sk = ctx.shape[1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if context is None and (hooks is None
                                or hooks.passthrough_attn(self.meta)):
            # hook-free self-attention stays in the PACKED projection layout
            # end-to-end: q/k/v feed the multi-head flash kernel as produced
            # and the output feeds to_out directly — none of the (B,H,S,D)
            # transposes below ever materialize (they are only free when XLA
            # fuses them into einsums; around a pallas_call they are real HBM
            # round-trips, 7.7 ms/step of the flagship bwd step).
            o = attention_packed(q, k, v, self.heads,
                                 scale=self.head_dim ** -0.5)
            return nn.Dense(inner, dtype=self.dtype, name="to_out")(o)

        # (B, S, H*D) -> (B, H, S, D)
        q = q.reshape(b, s, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, sk, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, sk, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        scale = self.head_dim ** -0.5

        if hooks is not None:
            q, k, v = hooks.qkv(self.meta, q, k, v)
            sk = k.shape[2]

        materialize = hooks is not None and (
            hooks.wants_probs(self.meta) or hooks.store(self.meta)
        )
        folded = None
        if materialize and not (hooks.store(self.meta)):
            # probability-free expression of the edit (e.g. ptp cross edits
            # folded into the value matrix) — keeps the short-K Pallas kernel
            # on the fast path instead of materializing (B, H, Sq, Sk) probs
            folded = hooks.cross_fold(self.meta, q, k, v)
        if folded is not None:
            q2, k2, v2, combine = folded
            o = combine(attention(q2, k2, v2, scale))
        elif materialize:
            # fp32 softmax, then probability edits/stores/PV in the compute
            # dtype: at SD's 64x64 cross layers the probs tensor is
            # (32, 8, 4096, 77) — keeping it fp32 through the hook path
            # doubles its HBM traffic for no accuracy the PV matmul (already
            # bf16) would keep.
            p = attention_probs(q, k, scale).astype(self.dtype)
            if hooks.store(self.meta):
                # reference stores (B*H, S, Sk) maps summed over steps
                # (ptp.py:143-183); we sow per-layer and let the engine reduce.
                self.sow("attn_store", self.meta.store_key, p,
                         init_fn=lambda: 0.0, reduce_fn=lambda a, b_: b_)
            p = hooks.probs(self.meta, p)
            o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        else:
            o = attention(q, k, v, scale)

        if hooks is not None:
            o = hooks.out(self.meta, o)

        o = o.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(o)


class _DenseParams(nn.Module):
    """Parameters of an nn.Dense (same pytree path, init, and param_dtype)
    without its apply — so FeedForward can hand the raw kernels to the fused
    GEGLU Pallas op while models/weights.py keeps the diffusers key mapping."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> 4*dim -> dim).

    Exact (erf) gelu on the gate: diffusers GEGLU uses F.gelu's default, not
    the tanh approximation (pinned by tests/test_torch_neural_crosscheck.py).
    Routed through ops/geglu.geglu_mlp: the plain-XLA expression with the
    fusion-friendly polynomial-erf gelu (a fused Pallas kernel exists but
    measured neutral in-model on v5e — see ops/geglu.py)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w1, b1 = _DenseParams(self.dim * 8, name="geglu_proj")(x.shape[-1])
        w2, b2 = _DenseParams(self.dim, name="proj_out")(self.dim * 4)
        return geglu_mlp(x, w1, b1, w2, b2, dtype=self.dtype)


class BasicTransformerBlock(nn.Module):
    """LayerNorm -> self-attn -> LayerNorm -> cross-attn -> LayerNorm -> GEGLU FF."""

    heads: int
    head_dim: int
    self_meta: AttnLayerMeta
    cross_meta: AttnLayerMeta
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, hooks: Optional[AttnHooks] = None,
                 dup: bool = False):
        dim = self.heads * self.head_dim
        if hooks is not None:
            x = hooks.hidden(self.self_meta, x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + CrossAttention(self.heads, self.head_dim, self.self_meta, self.dtype,
                               name="attn1")(h, None, hooks)
        if dup:
            # CFG shared prefix: the uncond/cond rows were identical through
            # the self-attention above; duplicate here, where the context
            # first differentiates them (engine guarantees hook-freedom on
            # the prefix via AttnHooks.cfg_prefix_safe)
            x = jnp.tile(x, (2, 1, 1))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + CrossAttention(self.heads, self.head_dim, self.cross_meta, self.dtype,
                               name="attn2")(h, context, hooks)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + FeedForward(dim, self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """GroupNorm -> proj in -> transformer block(s) -> proj out, residual.

    Projections are 1x1 convs on the NHWC map (SD1.x) or, with `use_linear`,
    nn.Dense on the flattened (B, H*W, C) tokens (SD2.x
    `use_linear_projection`; diffusers reshapes BEFORE proj_in there, after
    it otherwise — numerically a 1x1 conv and a Dense agree, only the param
    shape and the reshape order differ)."""

    heads: int
    head_dim: int
    self_meta: AttnLayerMeta
    cross_meta: AttnLayerMeta
    depth: int = 1
    # (self, cross) meta pairs for inner blocks 1..depth-1 (SDXL depth>1
    # stages); block 0 uses self_meta/cross_meta
    extra_metas: Tuple[Tuple[AttnLayerMeta, AttnLayerMeta], ...] = ()
    groups: int = 32
    use_linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, hooks: Optional[AttnHooks] = None,
                 dup: bool = False):
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x).astype(self.dtype)
        if self.use_linear:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            sm, cm = (self.self_meta, self.cross_meta) if d == 0 \
                else self.extra_metas[d - 1]
            x = BasicTransformerBlock(self.heads, self.head_dim, sm, cm,
                                      self.dtype,
                                      name=f"blocks_{d}")(x, context, hooks,
                                                          dup=dup and d == 0)
        if self.use_linear:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(-1, h, w, c)
        else:
            x = x.reshape(-1, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        if residual.shape[0] != x.shape[0]:
            residual = jnp.tile(residual, (x.shape[0] // residual.shape[0], 1, 1, 1))
        return x + residual
