"""Regularized DDIM inversion from pix2pix-zero (registry key "regdiffinv").

Counterpart of /root/reference/modules/inversion/
regularized_diffusion_inversion.py: per forward step, `num_reg_steps` (5) outer
iterations of (`num_ac_rolls` (5) autocorrelation-gradient steps + one
KL-gradient step) applied to the noise prediction; forward guidance is
linspace(2,1,1000)[t].

JAX notes: the reference reseeds its roll generator every diffusion step
(:117), so roll amounts are identical across steps — here they are precomputed
host-side (static shifts), and the 25 gradient updates per step are unrolled
`jax.grad` calls on cheap elementwise losses inside the forward scan.
torch's unbiased variance (ddof=1) is matched in the KL term.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import DiffusionInversion


def _avg_pool2(x):
    """2x2 stride-2 average pool over the last two dims of (c, h, w)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID")
    return s / 4.0


class RegularizedDiffusionInversion(DiffusionInversion):
    name = "regdiffinv"

    def __init__(self, model, scheduler=None, num_inference_steps=None,
                 guidance_scale_bwd=None, guidance_scale_fwd=None, verbose=False,
                 lambda_ac: float = 20.0, lambda_kl: float = 20.0,
                 num_reg_steps: int = 5, num_ac_rolls: int = 5, seed: int = 0):
        super().__init__(model, scheduler, num_inference_steps, guidance_scale_bwd,
                         guidance_scale_fwd, verbose=verbose, seed=seed)
        self.lambda_ac = lambda_ac
        self.lambda_kl = lambda_kl
        self.num_reg_steps = num_reg_steps
        self.num_ac_rolls = num_ac_rolls
        self.gs_fwd_table = np.linspace(2, 1, 1000).astype(np.float32)

    def config_key(self):
        return super().config_key() + (self.lambda_ac, self.lambda_kl,
                                       self.num_reg_steps, self.num_ac_rolls)

    # ------------------------------------------------------------ regularizer

    def _scales(self, h: int):
        scales = []
        while True:
            scales.append(h)
            if h <= 8:
                break
            h //= 2
        return scales

    def _roll_table(self, h: int) -> np.ndarray:
        """Static roll amounts per (outer, inner, scale) — reference reseeds
        per step so the table is step-independent (:117-121)."""
        scales = self._scales(h)
        rs = np.random.RandomState(0)
        out = np.zeros((self.num_reg_steps, self.num_ac_rolls, len(scales)), np.int64)
        for o in range(self.num_reg_steps):
            for i in range(self.num_ac_rolls):
                for s, sc in enumerate(scales):
                    out[o, i, s] = rs.randint(0, max(sc // 2, 1))
        return out

    def _auto_corr_loss(self, e, rolls):
        """e: (1, h, w, c); multi-scale autocorrelation (reference :42-69)."""
        x = e[0].transpose(2, 0, 1)  # (c, h, w)
        loss = 0.0
        for s, h in enumerate(self._scales(x.shape[1])):
            roll = int(rolls[s])
            mh = (x * jnp.roll(x, roll, axis=1)).mean(axis=(1, 2))
            mw = (x * jnp.roll(x, roll, axis=2)).mean(axis=(1, 2))
            loss = loss + (mh ** 2).sum() + (mw ** 2).sum()
            if x.shape[1] > 8:
                x = _avg_pool2(x)
        return loss

    def _kl_loss(self, e):
        mu = e.mean()
        var = e.var(ddof=1)
        return var + mu ** 2 - 1 - jnp.log(var + 1e-7)

    def regularize_noise_pred(self, eps):
        rolls = self._roll_table(eps.shape[1])
        e_t = eps
        for o in range(self.num_reg_steps):
            if self.lambda_ac > 0:
                for i in range(self.num_ac_rolls):
                    g = jax.grad(lambda e: self._auto_corr_loss(e, rolls[o, i]))(e_t)
                    e_t = e_t - self.lambda_ac * (g / self.num_ac_rolls)
            if self.lambda_kl > 0:
                g = jax.grad(self._kl_loss)(e_t)
                e_t = e_t - self.lambda_kl * g
        return e_t

    # ---------------------------------------------------------------- forward

    def predict_step_forward(self, params, carry, inp, context, ctrl, layout,
                             guidance_scale=None):
        latent, state, rng = carry["latent"], carry["state"], carry["rng"]
        i, t = inp["i"], inp["t"]
        rng, krng = jax.random.split(rng)
        latent = ctrl.begin_step(i, t, latent, state)
        gs = jnp.asarray(self.gs_fwd_table)[jnp.clip(t, 0, 999)]
        eps, store = self.predict_noise(params, latent, t, context, gs,
                                        hooks=ctrl.hooks(i, state, layout),
                                        collect_store=ctrl.collect_store(),
                                        is_fwd=True, inp=inp)
        eps = self.regularize_noise_pred(eps)
        new_latent = self.step_forward(eps, t, latent, inp, krng)
        new_latent, state = ctrl.end_step(i, t, new_latent, eps, store, state)
        carry = {**carry, "latent": new_latent, "state": state, "rng": rng}
        return carry, {"latent": new_latent, "eps": eps}
