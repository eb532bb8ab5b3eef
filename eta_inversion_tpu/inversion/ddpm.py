"""Edit-friendly DDPM inversion (registry keys "ddpminv", "cyclediff").

Counterpart of /root/reference/modules/inversion/ddpm_inversion.py
(Huberman-Spiegelglas et al.): pre-sample the noised trajectory, extract
per-step noisemaps z, replay them during denoising with eta=1; skip_steps=0.36,
forward CFG 3.5 / backward CFG 9, and per-branch guidance [fwd, bwd] when
denoising the [source, target] pair (:154-159).

TPU-native redesign of the forward pass: because the trajectory {x_t} is fully
presampled, the S UNet evaluations of the inversion loop are *independent* —
the reference runs them sequentially (:92-104); here they are batched across
timesteps in chunks, turning 50 small UNet calls into a few large ones (better
MXU utilization, fewer dispatches).  Results are bitwise-identical to the
sequential order because no step reads another step's output.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers import ddim_backward_step, ddpm_inverse_step, sample_trajectory
from .base import DiffusionInversion


class DDPMInversion(DiffusionInversion):
    name = "ddpminv"

    dft_skip_steps = 0.36
    dft_forward_seed = 0

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 forward_seed: Optional[int] = 0, skip_steps: Optional[float] = None,
                 markovian_forward: bool = False, fwd_chunk: int = 10, seed: int = 0):
        scheduler = scheduler or "ddpm"
        guidance_scale_fwd = guidance_scale_fwd or 3.5
        guidance_scale_bwd = guidance_scale_bwd or 9
        self.skip_steps = skip_steps or self.dft_skip_steps
        self.forward_seed = forward_seed if (forward_seed is None or forward_seed >= 0) else None
        self.markovian_forward = markovian_forward
        self.fwd_chunk = fwd_chunk
        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)

    def config_key(self):
        return super().config_key() + (self.skip_steps, self.markovian_forward,
                                       self.fwd_chunk, self.forward_seed)

    # ------------------------------------------------------------- forward

    def diffusion_forward(self, latent, context, guidance_scale_fwd=None,
                          ctrl=None, rng=None) -> Dict[str, Any]:
        gs = self.guidance_scale_fwd if guidance_scale_fwd is None else guidance_scale_fwd
        S = self.num_inference_steps
        ts_asc = self.schedule.timesteps_forward()  # ascending
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.forward_seed if self.forward_seed is not None else self.seed)

        # chunk size must divide S
        chunk = max(c for c in range(1, min(self.fwd_chunk, S) + 1) if S % c == 0)

        def fn(params, latent, context, rng):
            xts = sample_trajectory(self.schedule, latent, rng,
                                    markovian=self.markovian_forward)
            # step i (ascending t): xt = xts[S-1-i], xtm1 = xts[S-i]
            xt_all = jnp.flip(xts[:S], axis=0)      # (S, B, h, w, c), index i
            xtm1_all = jnp.flip(xts[1:], axis=0)    # (S, B, h, w, c)
            t_all = jnp.asarray(ts_asc)

            b = latent.shape[0]

            def chunk_body(_, inp):
                # batch the chunk's independent steps through one UNet call
                xt = inp["xt"].reshape((chunk * b,) + latent.shape[1:])
                t = jnp.repeat(inp["t"], b)
                n = context.shape[0] // 2
                ctx_u = jnp.tile(context[:n], (chunk, 1, 1))
                ctx_c = jnp.tile(context[n:], (chunk, 1, 1))
                ctx = jnp.concatenate([ctx_u, ctx_c], axis=0)
                # full CFG (reference calls predict_noise with is_fwd=False,
                # ddpm_inversion.py:71); timesteps differ per row
                eps_all = self.model.unet.apply(
                    {"params": params["unet"]}, jnp.concatenate([xt, xt], axis=0),
                    jnp.concatenate([t, t]), ctx)
                eps_u, eps_c = eps_all[: chunk * b], eps_all[chunk * b:]
                eps = eps_u + gs * (eps_c - eps_u)
                # v-pred conversion commutes with the affine CFG combine
                eps = self.to_eps(eps, xt, t)
                eps = eps.reshape((chunk, b) + latent.shape[1:])
                xtm1_new, z = jax.vmap(
                    lambda e, t_, a, bb: ddpm_inverse_step(self.schedule, e, t_, a, bb)
                )(eps, inp["t"], inp["xt"], inp["xtm1"])
                return None, {"latent": xtm1_new, "eps": eps, "z": z}

            inputs = {
                "xt": xt_all.reshape((S // chunk, chunk) + xt_all.shape[1:]),
                "xtm1": xtm1_all.reshape((S // chunk, chunk) + xtm1_all.shape[1:]),
                "t": t_all.reshape(S // chunk, chunk),
            }
            _, ys = jax.lax.scan(chunk_body, None, inputs)
            latents_steps = ys["latent"].reshape((S,) + latent.shape)
            eps_steps = ys["eps"].reshape((S,) + latent.shape)
            z_steps = ys["z"].reshape((S,) + latent.shape)
            # first (t=min) noisemap zeroed (reference :104-105)
            z_steps = z_steps.at[0].set(0.0)
            latents_all = jnp.concatenate([latents_steps, xts[0][None]], axis=0)
            return {"latents": latents_all, "noise_preds": eps_steps,
                    "variance_noises": z_steps,
                    "etas": jnp.ones((S,), latent.dtype),
                    "zT_inv": xts[0]}

        jfn = self._cached("ddpm_fwd", (gs, latent.shape, context.shape, chunk), fn)
        return jfn(self.model.params, latent, context, rng)

    # ------------------------------------------------------------- backward

    def get_bwd_skip(self) -> int:
        return int(self.skip_steps * self.num_inference_steps)

    def skip_inv_result(self, inv_result: Dict[str, Any]) -> Dict[str, Any]:
        skip = self.get_bwd_skip()
        out = dict(inv_result)
        for k in ("latents", "noise_preds", "variance_noises", "etas"):
            out[k] = inv_result[k][:-skip] if skip else inv_result[k]
        return out

    def sample(self, inv_result, prompt=None, context=None, ctrl=None, rng=None):
        if inv_result is None:
            return None
        if self.skip_steps is not None:
            inv_result = self.skip_inv_result(inv_result)
        return super().sample(inv_result, prompt=prompt, context=context, ctrl=ctrl,
                              rng=rng)

    def backward_timesteps(self, inv_result):
        return self.schedule.timesteps_backward[self.get_bwd_skip():]

    def backward_scan_extras(self, inv_result, n_prompts):
        extras = dict(super().backward_scan_extras(inv_result, n_prompts))
        extras["eta"] = jnp.flip(jnp.asarray(inv_result["etas"]), axis=0)
        extras["variance_noise"] = jnp.flip(
            jnp.asarray(inv_result["variance_noises"]), axis=0)
        return extras

    def combine_guidance(self, eps_u, eps_c, guidance_scale, latent, t, inp=None,
                         is_fwd=False):
        # per-branch guidance for [source(s), target(s)] pairs: sources keep
        # the forward scale (reference ddpm_inversion.py:154-159; generalized
        # to B pairs laid out [s_1..s_B, t_1..t_B])
        n = eps_u.shape[0]
        if not is_fwd and n >= 2 and n % 2 == 0:
            half = n // 2
            gs = jnp.asarray([self.guidance_scale_fwd] * half
                             + [self.guidance_scale_bwd] * half,
                             dtype=eps_u.dtype).reshape(n, 1, 1, 1)
            return eps_u + gs * (eps_c - eps_u)
        return eps_u + guidance_scale * (eps_c - eps_u)

    def step_backward(self, eps, t, latent, inp=None, rng=None):
        vn = inp["variance_noise"]
        if vn.shape[0] > 1 and latent.shape[0] == 2 * vn.shape[0]:
            # B>1 pair batching: each [s_i, t_i] pair replays its own noisemap
            vn = jnp.concatenate([vn, vn], axis=0)
        return ddim_backward_step(self.schedule, latent, eps, t,
                                  eta=inp["eta"], noise=vn)
