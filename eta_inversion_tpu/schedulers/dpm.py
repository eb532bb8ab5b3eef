"""DPM-Solver++ multistep scheduler (forward + inverse) as pure functions.

Counterpart of the diffusers DPMSolverMultistepScheduler pair used by the
reference ("dpm" scheduler choice, /root/reference/modules/inversion/
diffusion_inversion.py:139-165 and modules/inverse_schedulers/
scheduling_dpmsolver_multistep_inverse.py).  dpmsolver++ algorithm, epsilon
prediction, solver orders 1/2 (midpoint) with diffusers' lower_order_final
ramp-down; the multistep state (previous converted model output + order
counter) is an explicit pytree carried through the diffusion scan instead of
scheduler-object attributes (reference :130-132).

Timestep grid matches diffusers: linspace(0, T-1, S+1).round()[::-1][:-1] for
denoising; the inverse runs the reversed grid with `noisiest_timestep` = T-1
as the final target.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .tables import DiffusionSchedule


def dpm_timesteps_backward(schedule: DiffusionSchedule) -> np.ndarray:
    T = schedule.config.num_train_timesteps
    S = schedule.num_inference_steps
    ts = np.linspace(0, T - 1, S + 1).round().astype(np.int64)[::-1][:-1]
    return ts.astype(np.int32)


def dpm_timesteps_forward(schedule: DiffusionSchedule, inv_steps: str = "samesame"
                          ) -> np.ndarray:
    """Ascending grid of the diffusers inverse scheduler: starts at 0 (the
    reference asserts steps[0] == 0, scheduling_dpmsolver_multistep_inverse.py:60);
    shiftshift prepends the first negative step and drops the last."""
    T = schedule.config.num_train_timesteps
    S = schedule.num_inference_steps
    ts = np.linspace(0, T - 1, S + 1).round().astype(np.int64)[:-1].astype(np.int32)
    if inv_steps == "shiftshift":
        first_neg = ts[0] - (ts[1] - ts[0])
        ts = np.concatenate([[first_neg], ts[:-1]]).astype(np.int32)
    return ts


def _lambda(schedule, t):
    a = jnp.sqrt(schedule.alpha_at(t))
    s = jnp.sqrt(1.0 - schedule.alpha_at(t))
    return jnp.log(jnp.maximum(a, 1e-20)) - jnp.log(jnp.maximum(s, 1e-20))


def _alpha_sigma(schedule, t):
    ab = schedule.alpha_at(t)
    return jnp.sqrt(ab), jnp.sqrt(1.0 - ab)


def convert_eps_to_x0(schedule, latent, eps, t):
    """dpmsolver++ data prediction from an epsilon prediction."""
    a, s = _alpha_sigma(schedule, t)
    return (latent - s * eps) / a


def dpm_init_state(latent_shape, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    return {
        "dpm_m_prev": jnp.zeros(latent_shape, dtype),  # previous x0 prediction
        "dpm_t_prev": jnp.asarray(-1, jnp.int32),      # its timestep
        "dpm_low": jnp.asarray(0, jnp.int32),          # lower_order_nums
    }


def dpm_step(schedule: DiffusionSchedule, state: Dict[str, jnp.ndarray],
             latent, eps, t, prev_t, is_last: bool, is_second_last: bool,
             solver_order: int = 2, lower_order_final: bool = True
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One multistep dpmsolver++ update from t to prev_t.

    `is_last`/`is_second_last` are static flags of the scan position is
    unknown — pass traced booleans; order selection follows diffusers
    (first order on the first step and, when lower_order_final and S < 15,
    on the final step).
    """
    m0 = convert_eps_to_x0(schedule, latent, eps, t)

    a_p, s_p = _alpha_sigma(schedule, prev_t)
    _, s_t = _alpha_sigma(schedule, t)
    lam_t = _lambda(schedule, t)
    lam_p = _lambda(schedule, prev_t)
    h = lam_p - lam_t

    # first order: x_p = (sigma_p/sigma_t) x - alpha_p (e^{-h} - 1) m0
    x_first = (s_p / s_t) * latent - a_p * (jnp.exp(-h) - 1.0) * m0

    # second order (midpoint): D1 = (m0 - m1)/r0, r0 = h_0/h
    m1 = state["dpm_m_prev"]
    t_s1 = state["dpm_t_prev"]
    lam_s1 = _lambda(schedule, jnp.maximum(t_s1, 0))
    h_0 = lam_t - lam_s1
    r0 = h_0 / h
    d1 = (m0 - m1) / jnp.where(r0 == 0, 1.0, r0)
    x_second = (s_p / s_t) * latent - a_p * (jnp.exp(-h) - 1.0) * m0 \
        - 0.5 * a_p * (jnp.exp(-h) - 1.0) * d1

    use_first = jnp.logical_or(state["dpm_low"] < 1, jnp.asarray(solver_order == 1))
    if lower_order_final and schedule.num_inference_steps < 15:
        use_first = jnp.logical_or(use_first, is_last)
    new_latent = jnp.where(use_first, x_first, x_second)

    new_state = {
        "dpm_m_prev": m0,
        "dpm_t_prev": jnp.asarray(t, jnp.int32),
        "dpm_low": jnp.minimum(state["dpm_low"] + 1, solver_order),
    }
    return new_latent, new_state
