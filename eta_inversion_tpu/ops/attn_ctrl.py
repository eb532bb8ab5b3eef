"""Functional attention-intervention protocol.

The reference implements editing by monkey-patching every `Attention.forward` in
the UNet and mutating Python controller state per call
(/root/reference/modules/utils/ptp_utils.py:196-302, masactrl_utils.py:74-153,
pnp_utils.py:67-195).  That is untraceable.  Here the UNet takes an optional
`AttnHooks` object whose methods are *pure functions* called at fixed points of
the (static) layer topology:

    qkv(meta, q, k, v)     -> (q, k, v)   before the attention kernel
    wants_probs(meta)      -> bool        static: materialize probabilities?
    probs(meta, p)         -> p           edit the (B, H, Sq, Sk) probabilities
    store(meta, p)         -> bool        static: sow this layer's probs?
    out(meta, o)           -> o           after the attention kernel
    resnet(meta, h)        -> h           after designated resnet blocks
    hidden(meta, h)        -> h           on the attention-layer input

Layer identity is static (`AttnLayerMeta`), so the per-layer/step counters the
reference maintains mutably (ptp.py:107-119) become compile-time constants; any
cross-step state (stores, step index, time-dependent alphas) is threaded through
the diffusion scan carry by the engine and baked into a fresh hooks object each
step.  When `hooks is None` every hook site compiles away entirely.

Stored attention maps are emitted through flax's `sow` into the "attn_store"
collection under key f"{place}_{type}_{res}_{i}" and are collected by the engine.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AttnLayerMeta:
    """Static identity of one attention layer in UNet forward-execution order.

    `idx` counts all 32 attention layers; `self_idx`/`cross_idx` count within
    the 16 self / 16 cross layers (forward order: down 0-5, mid 6, up 7-15 —
    matching the reference's masactrl layer numbering where start_layer=10
    addresses the up-block layers, /root/reference/modules/utils/masactrl.py:20-39).
    """

    idx: int
    is_cross: bool
    place: str  # "down" | "mid" | "up"
    res: int  # spatial side at this layer (64 / 32 / 16 / 8 for 512px input)
    self_idx: int
    cross_idx: int
    heads: int

    @property
    def kind(self) -> str:
        return "cross" if self.is_cross else "self"

    @property
    def store_key(self) -> str:
        return f"{self.place}_{self.kind}_{self.res}_{self.idx}"


@dataclasses.dataclass(frozen=True)
class ResnetMeta:
    """Static identity of a resnet block hook site (up blocks only; pnp injects
    features at up_blocks[1].resnets[1], /root/reference/modules/utils/
    pnp_utils.py:134-195)."""

    block: int  # up block index 0..3
    resnet: int  # resnet index within the block
    res: int


class AttnHooks:
    """No-op base hooks; subclass and override. All methods must be pure.

    Methods returning *static* decisions (`wants_probs`, `store`) must depend
    only on `meta` / Python config — never on traced values.

    `unet_in_rows` / `unet_out_rows` (static row-index tuples or None) let a
    controller restructure the UNet batch around the whole forward pass — the
    functional equivalent of the reference's whole-UNet forward patches
    (PnPUnetForward builds a 3-row [source, uncond, cond] batch and re-expands
    the output, /root/reference/modules/utils/pnp.py:101-150).
    """

    unet_in_rows = None
    unet_out_rows = None

    def wants_probs(self, meta: AttnLayerMeta) -> bool:
        return False

    def cfg_prefix_safe(self, first_self_meta: AttnLayerMeta) -> bool:
        """True if this hooks object provably does not act on the UNet's
        prefix up to (and including) the first self-attention layer — the
        uncond/cond CFG rows are identical there, so the engine runs the
        prefix once and tiles at the first cross-attention (exact dedup,
        ~25% of the pre-divergence compute).  Conservative default: off."""
        return False

    def store(self, meta: AttnLayerMeta) -> bool:
        return False

    def passthrough_attn(self, meta: AttnLayerMeta) -> bool:
        """Static: does this hooks object provably NOT intervene at this
        attention layer (qkv, probs, store, and out all identity)?  When True
        the engine may skip the hook calls entirely and take layout-optimized
        fast paths (the packed multi-head flash kernel — see
        ops/flash_attention.attention_packed).  Conservative default: False
        (every subclass that leaves some layers untouched should override
        with its own static gating)."""
        return False

    def hidden(self, meta: AttnLayerMeta, h):
        return h

    def qkv(self, meta: AttnLayerMeta, q, k, v) -> Tuple:
        return q, k, v

    def probs(self, meta: AttnLayerMeta, p):
        return p

    def cross_fold(self, meta: AttnLayerMeta, q, k, v):
        """Optional probability-free expression of a cross-attention edit.

        Return None (default) to use the materialized-probability path, or
        (q2, k2, v2, combine) where the edit has been folded into the value
        matrix / extra batch rows: the engine runs the unmaterialized
        attention kernel on (q2, k2, v2) and calls combine(o) to restore the
        original batch.  Must be equivalent to `probs` up to rounding."""
        return None

    def out(self, meta: AttnLayerMeta, o):
        return o

    def resnet(self, meta: ResnetMeta, h):
        return h


def flatten_store(collection) -> dict:
    """Flatten a sown "attn_store" collection (nested by module path) into
    {store_key: array}; store keys are globally unique per layer."""
    out = {}

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v)
            else:
                out[k] = v

    walk(dict(collection))
    return out


class ComposedHooks(AttnHooks):
    """Compose several hooks; applied in order."""

    def __init__(self, *hooks: Optional[AttnHooks]):
        self.hooks = [h for h in hooks if h is not None]

    def wants_probs(self, meta):
        return any(h.wants_probs(meta) for h in self.hooks)

    def store(self, meta):
        return any(h.store(meta) for h in self.hooks)

    def passthrough_attn(self, meta):
        return all(h.passthrough_attn(meta) for h in self.hooks)

    def hidden(self, meta, x):
        for h in self.hooks:
            x = h.hidden(meta, x)
        return x

    def qkv(self, meta, q, k, v):
        for h in self.hooks:
            q, k, v = h.qkv(meta, q, k, v)
        return q, k, v

    def probs(self, meta, p):
        for h in self.hooks:
            p = h.probs(meta, p)
        return p

    def out(self, meta, o):
        for h in self.hooks:
            o = h.out(meta, o)
        return o

    def resnet(self, meta, x):
        for h in self.hooks:
            x = h.resnet(meta, x)
        return x
