"""Edit-friendly DDPM inversion scheduler (Huberman-Spiegelglas et al.) as pure fns.

Replaces the reference's stateful `DDPMInverseScheduler`
(/root/reference/modules/inverse_schedulers/ddpm_inverse_scheduler.py).

Trajectory layout matches the reference: `xts` has shape (S+1, B, H, W, C) where
index i corresponds to timestep `timesteps_backward[i]` (descending t), and
`xts[S]` is the clean latent x0 (ddpm_inverse_scheduler.py:103-129).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .tables import DiffusionSchedule


def sample_trajectory(
    schedule: DiffusionSchedule,
    latent: jnp.ndarray,
    rng: jax.Array,
    markovian: bool = False,
) -> jnp.ndarray:
    """Sample the noised trajectory {x_t}.

    Non-markovian (default, `ddpminv`): each x_t drawn independently from x_0 —
    fully vectorized over timesteps (no scan needed; the reference loops,
    ddpm_inverse_scheduler.py:111-125).
    Markovian (`cyclediff`): x_t sampled from x_{t-1}; a `lax.scan` over
    ascending t.
    Returns xts of shape (S+1, *latent.shape) with x0 appended at the end.
    """
    ts_desc = jnp.asarray(schedule.timesteps_backward)  # (S,), descending
    S = ts_desc.shape[0]
    abar = schedule.alphas_cumprod

    if not markovian:
        noise = jax.random.normal(rng, (S,) + latent.shape, dtype=latent.dtype)
        a = abar[ts_desc].reshape((S,) + (1,) * latent.ndim)
        xts = latent[None] * jnp.sqrt(a) + noise * jnp.sqrt(1.0 - a)
    else:
        ts_asc = ts_desc[::-1]

        def body(carry, inp):
            cur = carry
            t, key = inp
            r = jax.random.normal(key, latent.shape, dtype=latent.dtype)
            a_t = schedule.alpha_at(t)
            a_prev = schedule.alpha_at(t - schedule.step_ratio)
            ratio = a_t / a_prev
            cur = cur * jnp.sqrt(ratio) + r * jnp.sqrt(1.0 - ratio)
            return cur, cur

        keys = jax.random.split(rng, S)
        _, xs = jax.lax.scan(body, latent, (ts_asc, keys))
        xts = xs[::-1]  # back to descending-t layout

    return jnp.concatenate([xts, latent[None]], axis=0)


def ddpm_inverse_step(
    schedule: DiffusionSchedule,
    eps: jnp.ndarray,
    t,
    xt: jnp.ndarray,
    xtm1: jnp.ndarray,
    eta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract the per-step noisemap z and numerically re-corrected x_{t-1}.

    Mirrors ddpm_inverse_scheduler.py:156-199:
      mu_t  = sqrt(a_prev) x0_pred + sqrt(1 - a_prev - eta^2 var) eps
      z     = (x_{t-1} - mu_t) / (eta sqrt(var))
      x_{t-1} <- mu_t + eta sqrt(var) z      (exact re-correction)
    """
    a_t = schedule.alpha_at(t)
    a_prev = schedule.alpha_at(schedule.prev_timestep(t))
    x0 = (xt - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    variance = schedule.variance(t)
    direction = jnp.sqrt(1.0 - a_prev - eta * variance) * eps
    mu_t = jnp.sqrt(a_prev) * x0 + direction
    z = (xtm1 - mu_t) / (eta * jnp.sqrt(variance))
    xtm1_new = mu_t + (eta * jnp.sqrt(variance)) * z
    return xtm1_new, z
