"""Negative-prompt inversion (registry key "npi").

Counterpart of /root/reference/modules/inversion/negative_prompt_inversion.py:
the conditional (source-prompt) embedding is reused as the null embedding in
every backward step — no optimization.  Implemented via the base engine's
per-step `uncond_emb` scan input.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .base import DiffusionInversion


class NegativePromptInversion(DiffusionInversion):
    name = "npi"

    def invert(self, image, prompt=None, context=None, guidance_scale_fwd=None,
               rng=None, **kwargs) -> Dict[str, Any]:
        res = super().invert(image, prompt, context, guidance_scale_fwd, rng=rng, **kwargs)
        # use conditional embedding as null embedding for every step
        # (reference negative_prompt_inversion.py:25-32)
        n = res["context"].shape[0] // 2
        cond = res["context"][n:]
        res["uncond_embeddings"] = jnp.broadcast_to(
            cond[None], (self.num_inference_steps,) + cond.shape)
        return res

    def backward_scan_extras(self, inv_result, n_prompts):
        extras = dict(super().backward_scan_extras(inv_result, n_prompts))
        if inv_result.get("uncond_embeddings") is not None:
            extras["uncond_emb"] = jnp.asarray(inv_result["uncond_embeddings"])
        return extras
