"""MasaCtrl editing (registry key "masactrl"): mutual self-attention control.

Counterpart of /root/reference/modules/utils/masactrl.py +
modules/editing/masactrl_editor.py: from denoising step `start_step` (4) and
self-attention layer `start_layer` (10 of 16), every batch row's keys/values
are replaced by the *source* row's (per CFG half), so target queries attend to
source content.  Because this is a pure k/v substitution before the attention
kernel, it composes with Pallas flash attention — no probability tensors are
ever materialized (the reference recomputes full sim matrices per layer,
masactrl.py:41-54).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..ops.attn_ctrl import AttnHooks, AttnLayerMeta
from .controller import BatchLayout, Controller
from .editor import Editor


@dataclasses.dataclass
class MasaCtrlHooks(AttnHooks):
    layout: BatchLayout
    gate: Any  # traced bool: step within the active range
    start_layer: int
    total_layers: int = 16

    def qkv(self, meta: AttnLayerMeta, q, k, v):
        if meta.is_cross or meta.self_idx < self.start_layer:
            return q, k, v
        n = self.layout.n_prompts
        if n < 2:
            return q, k, v
        B = self.layout.n_pairs

        def sub(x):
            # per CFG half [s_1..s_B, t_1..t_B]: every target row takes its
            # pair-source's k/v (reference: all rows take row 0's, the B=1
            # case; masactrl.py:64-71)
            halves = []
            for h0 in range(0, x.shape[0], n):
                src = x[h0: h0 + B]
                halves.append(jnp.concatenate([src, src], axis=0))
            rep = jnp.concatenate(halves, axis=0)
            return jnp.where(self.gate, rep, x)

        return q, sub(k), sub(v)


class MasaCtrlController(Controller):
    def __init__(self, engine, start_step: int = 4, start_layer: int = 10,
                 total_steps: Optional[int] = None):
        self.engine = engine
        self.start_step = start_step
        self.start_layer = start_layer
        self.total_steps = total_steps or engine.num_inference_steps

    def static_key(self):
        return ("masactrl", self.start_step, self.start_layer, self.total_steps)

    def hooks(self, i, state, layout: BatchLayout) -> AttnHooks:
        gate = jnp.logical_and(i >= self.start_step, i < self.total_steps)
        return MasaCtrlHooks(layout=layout, gate=gate, start_layer=self.start_layer)


class MasactrlEditor(Editor):
    """Counterpart of reference MasactrlEditor (masactrl_editor.py:12-71):
    invert with the source prompt (or ""), denoise [source, target] under
    mutual self-attention control."""

    def __init__(self, inverter, no_null_source_prompt: bool = True, step: int = 4,
                 layer: int = 10):
        self.inverter = inverter
        self.model = inverter.model
        self.no_null_source_prompt = no_null_source_prompt
        self.step = step
        self.layer = layer

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None, inv_cfg: Optional[Dict[str, Any]] = None,
             **kwargs) -> Optional[Dict[str, Any]]:
        assert cfg is None or cfg == {}, f"{cfg}"
        inv_cfg = inv_cfg or {}

        src_context = self.inverter.create_context(
            "" if not self.no_null_source_prompt else source_prompt)
        target_context = self.inverter.create_context(target_prompt)

        inv_res = self.inverter.invert(image, context=src_context,
                                       prompt=source_prompt, inv_cfg=inv_cfg)
        ctrl = MasaCtrlController(self.inverter, self.step, self.layer)
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
