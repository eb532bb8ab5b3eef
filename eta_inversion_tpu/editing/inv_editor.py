"""Inversion-quality editor (registry key "invedit"): reconstruction-only
(optionally VAE-only roundtrip).  Counterpart of
/root/reference/modules/editing/inv_editor.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..inversion.base import DiffusionInversion
from .editor import Editor


class InversionEditor(Editor):
    def __init__(self, inverter: DiffusionInversion, no_source_backward: bool = False,
                 vae_rec: bool = False, no_null_source_prompt: bool = True):
        self.inverter = inverter
        self.model = inverter.model
        self.no_source_backward = no_source_backward
        self.vae_rec = vae_rec
        self.no_null_source_prompt = no_null_source_prompt
        if no_source_backward:
            from .editor import check_no_source_backward

            check_no_source_backward(self, inverter)

    def edit(self, image, source_prompt: str, target_prompt: str,
             cfg: Optional[Dict[str, Any]] = None, inv_cfg: Optional[Dict[str, Any]] = None,
             **kwargs) -> Dict[str, Any]:
        assert cfg is None or cfg == {}

        if self.vae_rec:
            latent = self.inverter.encode(image)
            image_inv = self.inverter.decode(latent)
            return {"image": image_inv, "latent": latent}

        src_context = self.inverter.create_context(
            source_prompt if self.no_null_source_prompt else "")
        # thread inv_cfg through: eta-inversion needs edit_word_idx for its
        # forward masks and declares itself unsupported (None) without it
        inv_res = self.inverter.invert(image, context=src_context,
                                       inv_cfg=inv_cfg)
        edit_res = self.inverter.sample(inv_res, context=[src_context])
        if edit_res is None:
            return None
        return {"image": edit_res["image"], "latent": edit_res["latent"]}
