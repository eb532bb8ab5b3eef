"""Null-text inversion (registry key "nti").

Counterpart of /root/reference/modules/inversion/null_text_inversion.py: after
a DDIM inversion, optimize the *unconditional* embedding per timestep so that
the CFG denoising step reproduces the recorded forward trajectory
(null_optimization, reference :42-94): Adam lr = 1e-2*(1-i/100), up to
`num_inner_steps` (10) inner iterations, early stop when the pre-update loss
drops below `early_stop_epsilon + i*2e-5`; the optimized embedding warm-starts
the next timestep.

JAX structure: one jitted function — outer `lax.scan` over timesteps, inner
`lax.while_loop` whose body takes `jax.grad` of (UNet + DDIM step + MSE) wrt
the uncond embedding and applies a manual Adam update (matching torch Adam's
bias-corrected moments).  Matches the reference's break semantics: the update
of the iteration whose loss triggers the stop is still applied.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .base import DiffusionInversion


class NullTextInversion(DiffusionInversion):
    name = "nti"

    dft_num_inner_steps = 10
    dft_early_stop_epsilon = 1e-5

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 num_inner_steps: Optional[int] = None,
                 early_stop_epsilon: Optional[float] = None, seed: int = 0):
        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)
        self.num_inner_steps = num_inner_steps or self.dft_num_inner_steps
        self.early_stop_epsilon = early_stop_epsilon or self.dft_early_stop_epsilon

    def config_key(self):
        return super().config_key() + (self.num_inner_steps, self.early_stop_epsilon)

    # ---------------------------------------------------------------- nti core

    def null_optimization(self, latents, context) -> jnp.ndarray:
        """Optimize per-step uncond embeddings. latents: (S+1, 1, h, w, c) from
        the forward pass; returns (S, 1, 77, D)."""
        S = self.num_inference_steps
        ts = jnp.asarray(self.schedule.timesteps_backward)

        # dual-tower presets pack [pooled; micro-cond ids] into one extra
        # context row (models/__init__.py text_context_fn): that row is FIXED
        # conditioning, not a free parameter — the reference optimizes only
        # the 77 text embeddings (null_text_inversion.py:42-94)
        ucfg = self.model.preset.unet
        opt_rows = ucfg.context_tokens if ucfg.addition_embed else None

        def fn(params, latents, context):
            uncond0, cond = jnp.split(context, 2, axis=0)
            latent_prev_all = jnp.flip(latents, axis=0)[1:]  # step i target

            def unet(lat, ctx, t):
                out = self.model.unet.apply({"params": params["unet"]}, lat, t, ctx)
                return self.to_eps(out, lat, t)

            def outer(carry, inp):
                latent_cur, uncond = carry
                i, t, latent_prev = inp["i"], inp["t"], inp["prev"]
                lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
                thresh = self.early_stop_epsilon + i.astype(jnp.float32) * 2e-5

                eps_cond = jax.lax.stop_gradient(unet(latent_cur, cond, t))

                def loss_fn(u):
                    eps_u = unet(latent_cur, u, t)
                    eps = eps_u + self.guidance_scale_bwd * (eps_cond - eps_u)
                    rec = self.step_backward(eps, t, latent_cur)
                    return jnp.mean((rec - latent_prev) ** 2)

                def inner_cond(c):
                    j, _, _, _, loss = c
                    return jnp.logical_and(j < self.num_inner_steps, loss >= thresh)

                def inner_body(c):
                    j, u, m, v, _ = c
                    loss, g = jax.value_and_grad(loss_fn)(u)
                    # torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8
                    m = 0.9 * m + 0.1 * g
                    v = 0.999 * v + 0.001 * g * g
                    mh = m / (1.0 - 0.9 ** (j + 1.0))
                    vh = v / (1.0 - 0.999 ** (j + 1.0))
                    u = u - lr * mh / (jnp.sqrt(vh) + 1e-8)
                    if opt_rows is not None:  # keep the packed row fixed
                        u = u.at[:, opt_rows:].set(uncond0[:, opt_rows:])
                    return j + 1.0, u, m, v, loss

                j0 = jnp.asarray(0.0, jnp.float32)
                m0 = jnp.zeros_like(uncond)
                v0 = jnp.zeros_like(uncond)
                _, uncond_new, _, _, _ = jax.lax.while_loop(
                    inner_cond, inner_body, (j0, uncond, m0, v0, jnp.asarray(jnp.inf)))

                # denoise one step with the optimized null embedding
                eps_u = unet(latent_cur, uncond_new, t)
                eps = eps_u + self.guidance_scale_bwd * (eps_cond - eps_u)
                latent_next = self.step_backward(eps, t, latent_cur)
                return (latent_next, uncond_new), uncond_new

            inputs = {"i": jnp.arange(S, dtype=jnp.float32), "t": ts,
                      "prev": latent_prev_all}
            (_, _), uncond_list = jax.lax.scan(outer, (latents[-1], uncond0), inputs)
            return uncond_list

        jfn = self._cached("nti_opt", (latents.shape, context.shape), fn)
        return jfn(self.model.params, latents, context)

    def invert(self, image, prompt=None, context=None, guidance_scale_fwd=None,
               rng=None, **kwargs) -> Dict[str, Any]:
        res = super().invert(image, prompt, context, guidance_scale_fwd, rng=rng,
                             **kwargs)
        res["uncond_embeddings"] = self.null_optimization(res["latents"],
                                                          res["context"])
        return res

    def backward_scan_extras(self, inv_result, n_prompts):
        extras = dict(super().backward_scan_extras(inv_result, n_prompts))
        if inv_result.get("uncond_embeddings") is not None:
            extras["uncond_emb"] = jnp.asarray(inv_result["uncond_embeddings"])
        return extras
