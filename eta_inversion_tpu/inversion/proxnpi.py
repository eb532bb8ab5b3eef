"""Proximal negative-prompt inversion (registry key "proxnpi").

Counterpart of /root/reference/modules/inversion/
proximal_negative_prompt_inversion.py: NPI plus proximal guidance on the score
delta (cond - uncond) with an l0/l1 quantile-threshold shrinkage
(:61-128).  The reference's recon-mask machinery is computed but asserted away
/ deleted before use (:105-126), so only the shrinkage affects output; the
constructor keeps those arguments for config-surface parity.

Note: the reference's override also removes the guidance==0/1 single-branch
fast paths (:130-151) — backward is always full CFG; forward uses plain CFG.
"""

from __future__ import annotations

import jax.numpy as jnp

from .npi import NegativePromptInversion


class ProximalNegativePromptInversion(NegativePromptInversion):
    name = "proxnpi"

    dft_prox = "l0"
    dft_quantile = 0.7
    dft_recon_lr = 1
    dft_recon_t = 400
    dft_dilate_mask = 1

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 prox: str = "l0", quantile: float = 0.7, recon_lr: int = 1,
                 recon_t: int = 400, dilate_mask: int = 1, seed: int = 0):
        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)
        self.prox = prox
        self.quantile = quantile
        self.recon_lr = recon_lr
        self.recon_t = recon_t
        self.dilate_mask = dilate_mask

    def config_key(self):
        return super().config_key() + (self.prox, self.quantile)

    def proximal_guidance(self, eps_u, eps_c, t, guidance_scale):
        """Quantile-threshold shrinkage on the score delta (reference :61-128).
        The quantile is global over the whole delta tensor (batch included),
        matching the reference's `.quantile()`."""
        delta = eps_c - eps_u
        if self.prox is None:
            return eps_u + guidance_scale * delta
        if self.quantile > 0:
            threshold = jnp.quantile(jnp.abs(delta.astype(jnp.float32)), self.quantile)
        else:
            threshold = jnp.asarray(-self.quantile, jnp.float32)
        threshold = threshold.astype(delta.dtype)
        if self.prox == "l0":
            delta = delta - jnp.clip(delta, -threshold, threshold)
        elif self.prox == "l1":
            delta = delta - jnp.clip(delta, -threshold, threshold)
            delta = jnp.where(delta > 0, delta - threshold, delta)
            delta = jnp.where(delta < 0, delta + threshold, delta)
        else:
            raise NotImplementedError(self.prox)
        return eps_u + guidance_scale * delta

    def combine_guidance(self, eps_u, eps_c, guidance_scale, latent, t, inp=None,
                         is_fwd=False):
        if is_fwd:
            return eps_u + guidance_scale * (eps_c - eps_u)
        return self.proximal_guidance(eps_u, eps_c, t, guidance_scale)

    def predict_noise(self, params, latent, t, context, guidance_scale,
                      hooks=None, collect_store=False, is_fwd=False, inp=None,
                      force_full_cfg=False):
        # reference removes the 0/1 shortcuts: always full CFG when scale given
        return super().predict_noise(params, latent, t, context, guidance_scale,
                                     hooks, collect_store, is_fwd, inp,
                                     force_full_cfg=True)
