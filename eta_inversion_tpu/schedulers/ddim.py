"""Pure-function DDIM steps (forward/inverse directions, elementwise eta).

Replaces the reference's diffusers `DDIMScheduler.step` + custom
`DDIMInverseScheduler` (/root/reference/modules/inverse_schedulers/
scheduling_ddim_inverse.py:71-143).  Two deliberate TPU-native design points:

  * steps are pure functions over `DiffusionSchedule` tables, so they can sit in
    `lax.scan` bodies and be fused with CFG by XLA;
  * `eta` is natively a scalar *or elementwise array* broadcastable against the
    latent — the reference needed an operator-overloading `EtaTensor` hack to
    smuggle per-pixel eta past diffusers' scalar check
    (/root/reference/modules/inversion/eta_inversion.py:23-33).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .tables import DiffusionSchedule


def pred_x0(schedule: DiffusionSchedule, latent, eps, t):
    """Predicted clean sample x0 from the epsilon prediction at timestep t."""
    alpha_prod_t = schedule.alpha_at(t)
    beta_prod_t = 1.0 - alpha_prod_t
    return (latent - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)


def ddim_step(schedule: DiffusionSchedule, latent, eps, t_from, t_to):
    """Deterministic DDIM update from timestep `t_from` to `t_to` (either
    direction), mirroring the closed form in the reference
    (scheduling_ddim_inverse.py:71-100). Timesteps <0 resolve to
    final_alpha_cumprod; >999 are clamped."""
    t_max = schedule.config.num_train_timesteps - 1
    t_from = jnp.minimum(jnp.asarray(t_from), t_max)
    t_to = jnp.minimum(jnp.asarray(t_to), t_max)
    alpha_prod_t = schedule.alpha_at(t_from)
    alpha_prod_t_to = schedule.alpha_at(t_to)
    beta_prod_t = 1.0 - alpha_prod_t
    x0 = (latent - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
    direction = jnp.sqrt(1.0 - alpha_prod_t_to) * eps
    return jnp.sqrt(alpha_prod_t_to) * x0 + direction


def ddim_inverse_step(schedule: DiffusionSchedule, latent, eps, t, inv_steps: str = "sameshift"):
    """One inversion (noising) step; `t` is the UNet-evaluation timestep.

    Timestep-indexing modes follow the reference exactly
    (scheduling_ddim_inverse.py:127-141)."""
    d = schedule.step_ratio
    if inv_steps == "sameshift":
        return ddim_step(schedule, latent, eps, t - d, t)
    elif inv_steps in ("samesame", "shiftshift"):
        return ddim_step(schedule, latent, eps, t, t + d)
    raise ValueError(f"unknown inv_steps mode: {inv_steps}")


def ddim_backward_step(
    schedule: DiffusionSchedule,
    latent,
    eps,
    t,
    eta=0.0,
    noise: Optional[jnp.ndarray] = None,
):
    """Full DDIM denoising step t -> t-Δ with stochasticity eta.

    `eta` may be a float, a scalar array, or an array broadcastable to the
    latent (per-pixel eta, as eta-inversion requires).  When `eta != 0` a
    variance noise must be provided (explicit PRNG threading — no hidden RNG
    state as in torch).

    Matches diffusers `DDIMScheduler.step` semantics used by the reference
    backward process (clip_sample=False, epsilon prediction).
    """
    prev_t = schedule.prev_timestep(t)
    alpha_prod_t = schedule.alpha_at(t)
    alpha_prod_t_prev = schedule.alpha_at(prev_t)
    beta_prod_t = 1.0 - alpha_prod_t

    x0 = (latent - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(alpha_prod_t)

    variance = schedule.variance(t)
    eta = jnp.asarray(eta, dtype=latent.dtype)
    std_dev_t = eta * jnp.sqrt(variance)

    direction = jnp.sqrt(1.0 - alpha_prod_t_prev - std_dev_t ** 2) * eps
    prev_sample = jnp.sqrt(alpha_prod_t_prev) * x0 + direction

    if noise is not None:
        prev_sample = prev_sample + std_dev_t * noise
    return prev_sample


def ddim_backward_mu(schedule: DiffusionSchedule, latent, eps, t, eta):
    """The deterministic mean mu_t of the eta-DDIM backward step (no noise term).
    Used by eta-inversion's optimal-variance-noise solve
    (/root/reference/modules/inversion/eta_inversion.py:296-317)."""
    return ddim_backward_step(schedule, latent, eps, t, eta=eta, noise=None)
