"""Direct inversion (registry key "dirinv").

Counterpart of /root/reference/modules/inversion/direct_inversion.py: plain
DDIM inversion, and during denoising each step's source row is replaced by the
stored forward-trajectory latent (the per-step correction
`source_latent_prev - new_latent[:1]` added to row 0, reference :43-45).
The per-step source latents ride the scan as an extra input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import DiffusionInversion


class DirectInversion(DiffusionInversion):
    name = "dirinv"
    requires_source_rows = True  # bwd snaps rows [:B] to the fwd trajectory

    def backward_scan_extras(self, inv_result, n_prompts):
        extras = dict(super().backward_scan_extras(inv_result, n_prompts))
        latents = jnp.asarray(inv_result["latents"])  # (S+1, B, h, w, c)
        # step i uses latents[-(i+2)] (reference :53-58) == flip(latents)[i+1]
        extras["source_latent_prev"] = jnp.flip(latents, axis=0)[1:]
        return extras

    def predict_step_backward(self, params, carry, inp, context, ctrl, layout):
        latent, state, rng = carry["latent"], carry["state"], carry["rng"]
        i, t = inp["i"], inp["t"]
        rng, krng = jax.random.split(rng)
        latent = ctrl.begin_step(i, t, latent, state)
        ctx = inp.get("context", context)
        eps, store = self.predict_noise(params, latent, t, ctx,
                                        self.guidance_scale_bwd,
                                        hooks=ctrl.hooks(i, state, layout),
                                        collect_store=ctrl.collect_store(), inp=inp)
        new_latent = self.step_backward(eps, t, latent, inp, krng)
        # direct-inversion correction: snap source rows to the recorded
        # forward-trajectory latents; target rows keep their free trajectory
        # (pair-batched layout [s_1..s_B, t_1..t_B]; reference :43-45 is B=1).
        src_prev = inp["source_latent_prev"]
        B = src_prev.shape[0]
        new_latent = jnp.concatenate([src_prev, new_latent[B:]], axis=0)
        new_latent, state = ctrl.end_step(i, t, new_latent, eps, store, state)
        return {**carry, "latent": new_latent, "state": state, "rng": rng}, \
            {"latent": new_latent, "eps": eps}
