"""EDICT inversion (registry key "edict"): coupled latent pair with exactly
invertible affine-coupling steps.

Counterpart of /root/reference/modules/inversion/edict_inversion.py: two
latents (x, y) updated alternately — each steps using the *other's* noise
prediction — with mix_weight=0.93 averaging (backward) / unmixing (forward),
leapfrog step ordering, `init_image_strength` timestep cutting, and the
original EDICT float-timestep alpha interpolation quirk (get_alpha_and_beta,
reference :82-111 — note the deliberately preserved reversed lerp
`low*rem + high*(1-rem)`).

JAX structure: the pair is one (2, B, h, w, c) array in the scan carry; the
step-parity-dependent update order (leapfrog) is a dynamic permutation gather,
not a Python branch, so the whole loop stays a single `lax.scan`.  Controller
state is duplicated per pair slot (reference EdictController,
modules/editing/controller.py:71-110) and gathered/scattered with the same
permutation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..editing.controller import ControllerEmpty
from .base import DiffusionInversion


class EdictInversion(DiffusionInversion):
    name = "edict"

    dft_mix_weight = 0.93
    dft_leapfrog_steps = True
    dft_init_image_strength = 0.8

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 mix_weight: float = 0.93, leapfrog_steps: bool = True,
                 init_image_strength: float = 1.0, seed: int = 0):
        guidance_scale_fwd = guidance_scale_fwd or 3.0
        guidance_scale_bwd = guidance_scale_bwd or 3.0
        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)
        self.mix_weight = mix_weight
        self.leapfrog_steps = leapfrog_steps
        self.init_image_strength = init_image_strength
        self.t_limit = self.num_inference_steps - int(
            self.num_inference_steps * init_image_strength)

    def config_key(self):
        return super().config_key() + (self.mix_weight, self.leapfrog_steps,
                                       self.init_image_strength)

    # ------------------------------------------------------------- timesteps

    def forward_timesteps(self):
        ts = self.schedule.timesteps_backward[::-1].copy()  # ascending
        return ts[:-self.t_limit] if self.t_limit != 0 else ts

    def backward_timesteps(self, inv_result=None):
        ts = self.schedule.timesteps_backward
        return ts[self.t_limit:] if self.t_limit != 0 else ts

    # ------------------------------------------------------- edict scheduler

    def _alpha_float(self, t):
        """EDICT's float-timestep alpha with the original reversed-lerp quirk
        (reference :103-111); t < 0 resolves to final_alpha_cumprod."""
        t = jnp.asarray(t, jnp.float32)
        low = jnp.floor(t).astype(jnp.int32)
        high = jnp.ceil(t).astype(jnp.int32)
        rem = t - low.astype(jnp.float32)
        tmax = self.schedule.config.num_train_timesteps - 1
        low_a = self.schedule.alphas_cumprod[jnp.clip(low, 0, tmax)]
        high_a = self.schedule.alphas_cumprod[jnp.clip(high, 0, tmax)]
        interp = low_a * rem + high_a * (1.0 - rem)
        return jnp.where(t < 0, self.schedule.final_alpha_cumprod, interp)

    def edict_step_forward(self, sample, eps, t):
        """x_{t-Δ} -> x_t (reference EdictSchedulerInverse.step :194-222)."""
        prev_t = t.astype(jnp.float32) - (
            self.schedule.config.num_train_timesteps / self.num_inference_steps)
        a_t = self.schedule.alphas_cumprod[jnp.clip(t, 0, 999)]
        b_t = 1.0 - a_t
        a_prev = self._alpha_float(prev_t)
        aq = jnp.sqrt(a_t / a_prev)
        return aq * sample + jnp.sqrt(b_t) * eps - aq * jnp.sqrt(1.0 - a_prev) * eps

    def edict_step_backward(self, sample, eps, t):
        """x_t -> x_{t-Δ} (reference EdictScheduler.step :144-179, eta=0)."""
        prev_t = t.astype(jnp.float32) - (
            self.schedule.config.num_train_timesteps / self.num_inference_steps)
        a_t = self.schedule.alphas_cumprod[jnp.clip(t, 0, 999)]
        b_t = 1.0 - a_t
        a_prev = self._alpha_float(prev_t)
        aq = jnp.sqrt(a_t / a_prev)
        return sample / aq - jnp.sqrt(b_t) / aq * eps + jnp.sqrt(1.0 - a_prev) * eps

    # ------------------------------------------------------------- pair logic

    def sync_pair(self, pair, is_fwd: bool):
        """Mix (backward) / unmix (forward) the coupled pair (reference
        :317-338).  Sequential by construction: the second line uses the
        first's updated value."""
        w = self.mix_weight
        x, y = pair[0], pair[1]
        if is_fwd:
            y = (y - (1 - w) * x) / w
            x = (x - (1 - w) * y) / w
        else:
            x = w * x + (1 - w) * y
            y = (1 - w) * x + w * y
        return jnp.stack([x, y], axis=0)

    # --------------------------------------------------------------- latents

    def encode(self, image):
        latent = super().encode(image)
        return jnp.stack([latent, latent], axis=0)  # (2, B, h, w, c)

    def decode(self, pair):
        if pair.ndim == 4:  # already-flat rows (e.g. sample() after flat_latent)
            return super().decode(pair)
        flat = jnp.concatenate([pair[0], pair[1]], axis=0)
        return super().decode(flat)

    def flat_latent(self, pair):
        # the x chain is the output (reference edict_inversion.py's denoise
        # loop reads the first coupled latent as the result)
        return pair[0]

    def cat_latent(self, latents: List[jnp.ndarray]) -> jnp.ndarray:
        # each element is a pair (2, B, ...); batch within each slot
        return jnp.concatenate(latents, axis=1)

    # ------------------------------------------------------------ scan bodies

    def _half_updates(self, params, pair, stacked_state, i, t, context, ctrl,
                      layout, gs, is_fwd, S_dir):
        """Both coupled half-updates in edict order via a dynamic permutation."""
        if is_fwd:
            if self.leapfrog_steps:
                orig_i = S_dir - (i + 1)
                offset = (orig_i + 1) % 2
            else:
                offset = jnp.asarray(1)
            step_fn = self.edict_step_forward
        else:
            offset = i % 2
            step_fn = self.edict_step_backward
        perm = jnp.stack([offset, 1 - offset]).astype(jnp.int32)
        pair_p = pair[perm]
        state_p = jax.tree.map(lambda x: x[perm], stacked_state)

        for k in range(2):
            state_k = jax.tree.map(lambda x: x[k], state_p)
            base, other = pair_p[k], pair_p[1 - k]
            base = ctrl.begin_step(i, t, base, state_k)
            hooks = ctrl.hooks(i, state_k, layout)
            eps, store = self.predict_noise(params, other, t, context, gs,
                                            hooks=hooks,
                                            collect_store=ctrl.collect_store(),
                                            is_fwd=is_fwd)
            new = step_fn(base, eps, t).astype(base.dtype)
            if not is_fwd:
                new, state_k = ctrl.end_step(i, t, new, eps, store, state_k)
            pair_p = pair_p.at[k].set(new)
            state_p = jax.tree.map(lambda full, leaf: full.at[k].set(leaf),
                                   state_p, state_k)

        inv_perm = perm  # perm is an involution for offset in {0, 1}
        pair = pair_p[inv_perm]
        stacked_state = jax.tree.map(lambda x: x[inv_perm], state_p)
        return pair, stacked_state

    def diffusion_forward(self, latent, context, guidance_scale_fwd=None,
                          ctrl=None, rng=None) -> Dict[str, Any]:
        ctrl = ctrl or ControllerEmpty()
        gs = self.guidance_scale_fwd if guidance_scale_fwd is None else guidance_scale_fwd
        ts = self.forward_timesteps()
        S_dir = len(ts)
        n_prompts = context.shape[0] // 2
        layout = self._layout(n_prompts, gs)
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)

        def fn(params, pair, context, state0, rng):
            stacked = jax.tree.map(lambda x: jnp.stack([x, x], axis=0), state0)

            def body(carry, inp):
                p, st = carry
                i, t = inp["i"], inp["t"]
                p = self.sync_pair(p, is_fwd=True)
                p, st = self._half_updates(params, p, st, i, t, context, ctrl,
                                           layout, gs, True, S_dir)
                return (p, st), p

            inputs = {"i": jnp.arange(S_dir), "t": jnp.asarray(ts)}
            (p, st), ys = jax.lax.scan(body, (pair, stacked), inputs)
            return {"latents": jnp.concatenate([pair[None], ys], axis=0),
                    "zT_inv": p}

        jfn = self._cached("edict_fwd", (gs, latent.shape, context.shape,
                                         ctrl.static_key(), layout), fn)
        state0 = ctrl.init_state(self, latent, context)
        out = jfn(self.model.params, latent, context, state0, rng)
        out["noise_preds"] = None
        return out

    def diffusion_backward(self, pair, context, inv_result, ctrl=None, rng=None):
        ctrl = ctrl or ControllerEmpty()
        ts = self.backward_timesteps()
        S_dir = len(ts)
        n_prompts = context.shape[0] // 2
        layout = self._layout(n_prompts, self.guidance_scale_bwd)
        gs = self.guidance_scale_bwd
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed + 1)

        def fn(params, pair, context, state0, rng):
            stacked = jax.tree.map(lambda x: jnp.stack([x, x], axis=0), state0)

            def body(carry, inp):
                p, st = carry
                i, t = inp["i"], inp["t"]
                p, st = self._half_updates(params, p, st, i, t, context, ctrl,
                                           layout, gs, False, S_dir)
                p = self.sync_pair(p, is_fwd=False)
                return (p, st), None

            inputs = {"i": jnp.arange(S_dir), "t": jnp.asarray(ts)}
            (p, _), _ = jax.lax.scan(body, (pair, stacked), inputs)
            return p

        jfn = self._cached("edict_bwd", (pair.shape, context.shape,
                                         ctrl.static_key(), layout), fn)
        state0 = ctrl.init_state(self, pair, context)
        return jfn(self.model.params, pair, context, state0, rng)
