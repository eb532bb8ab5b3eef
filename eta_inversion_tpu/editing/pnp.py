"""Plug-and-play editing (registry key "pnp"): feature + self-attention
injection.

Counterpart of /root/reference/modules/utils/pnp.py + pnp_utils.py +
modules/editing/pnp_editor.py.  The reference patches the whole UNet forward to
run a 3-row [source, uncond, cond] batch, re-expanding outputs as
[0, 1, 0, 2] (pnp.py:101-150); injects source q/k into the self-attention of
decoder layers 8-15 for the first `pnp_attn_t` (0.5) fraction of steps, and
source conv2 features at up_blocks[1].resnets[1] for the first `pnp_f_t` (0.8)
fraction (pnp_utils.py:67-195).  Here all three interventions are functional:
a static UNet batch plan on the hooks object, a q/k row substitution, and the
ResnetBlock inner (pre-residual) feature hook — gated by traced step index.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta, ResnetMeta
from .controller import BatchLayout, Controller
from .editor import Editor

# reference res_dict {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]} == self-attention
# layers 8..15 in forward order (decoder layers 4-11 of the 16 self layers;
# pnp_utils.py:122 — not the first block of the lowest-res up stage)
PNP_SELF_LAYERS = tuple(range(8, 16))
PNP_CONV_BLOCK = (1, 1)  # up_blocks[1].resnets[1]


@dataclasses.dataclass
class PnpHooks(AttnHooks):
    """Hooks for the pnp batch [sources(B), unconds(B), conds(B)]."""

    qk_gate: Any  # traced bool
    conv_gate: Any  # traced bool
    # UNet batch plan (pnp.py:127-150), pair-batched: input
    # [u_s(B), u_t(B), c_s(B), c_t(B)] -> [u_s(B), u_t(B), c_t(B)]; output
    # re-expanded so each source branch denoises unconditionally
    unet_in_rows: Any = (0, 1, 3)
    unet_out_rows: Any = (0, 1, 0, 2)

    def passthrough_attn(self, meta: AttnLayerMeta) -> bool:
        return not meta.is_cross and meta.self_idx not in PNP_SELF_LAYERS

    def qkv(self, meta: AttnLayerMeta, q, k, v):
        if meta.is_cross or meta.self_idx not in PNP_SELF_LAYERS:
            return q, k, v
        b = q.shape[0]
        sb = b // 3

        def inject(x):
            src = jnp.tile(x[:sb], (3,) + (1,) * (x.ndim - 1))
            return jnp.where(self.qk_gate, src, x)

        return inject(q), inject(k), v

    def resnet(self, meta: ResnetMeta, h):
        if (meta.block, meta.resnet) != PNP_CONV_BLOCK:
            return h
        sb = h.shape[0] // 3
        src = jnp.tile(h[:sb], (3,) + (1,) * (h.ndim - 1))
        return jnp.where(self.conv_gate, src, h)


class PnpController(Controller):
    def __init__(self, engine, pnp_f_t: float = 0.8, pnp_attn_t: float = 0.5):
        S = engine.num_inference_steps
        self.qk_k = int(S * pnp_attn_t)
        self.conv_k = int(S * pnp_f_t)

    def static_key(self):
        return ("pnp", self.qk_k, self.conv_k)

    def hooks(self, i, state, layout: BatchLayout) -> AttnHooks:
        B = layout.n_pairs
        in_rows = tuple(range(0, B)) + tuple(range(B, 2 * B)) + \
            tuple(range(3 * B, 4 * B))
        out_rows = tuple(range(0, B)) + tuple(range(B, 2 * B)) + \
            tuple(range(0, B)) + tuple(range(2 * B, 3 * B))
        return PnpHooks(qk_gate=i < self.qk_k, conv_gate=i < self.conv_k,
                        unet_in_rows=in_rows, unet_out_rows=out_rows)


class PlugAndPlayEditor(Editor):
    """Counterpart of reference PlugAndPlayEditor (pnp_editor.py:12-71)."""

    def __init__(self, inverter, no_null_source_prompt: bool = True,
                 pnp_f_t: float = 0.8, pnp_attn_t: float = 0.5):
        self.inverter = inverter
        self.model = inverter.model
        self.no_null_source_prompt = no_null_source_prompt
        self.negative_prompt = "ugly, blurry, black, low res, unrealistic"
        self.pnp_f_t = pnp_f_t
        self.pnp_attn_t = pnp_attn_t

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None, inv_cfg: Optional[Dict[str, Any]] = None,
             **kwargs) -> Optional[Dict[str, Any]]:
        assert cfg is None or cfg == {}
        inv_cfg = inv_cfg or {}

        src_context = self.inverter.create_context(
            "" if not self.no_null_source_prompt else source_prompt)
        inv_res = self.inverter.invert(image, prompt=source_prompt,
                                       context=src_context, inv_cfg=inv_cfg)

        if self.negative_prompt:
            target_context = self.inverter.create_context(
                target_prompt, negative_prompt=self.negative_prompt)
        else:
            target_context = self.inverter.create_context(target_prompt)

        ctrl = PnpController(self.inverter, self.pnp_f_t, self.pnp_attn_t)
        edit_res = self.inverter.sample(inv_res, context=[src_context, target_context],
                                        ctrl=ctrl)
        if edit_res is None:
            return None
        return {
            "image_inv": edit_res["image"][0:1],
            "image": edit_res["image"][1:2],
            "latent_inv": edit_res["latent"][0:1],
            "latent": edit_res["latent"][1:2],
        }
