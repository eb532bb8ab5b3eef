"""DPM-Solver++ multistep scheduler (forward + inverse) as pure functions.

Counterpart of the diffusers DPMSolverMultistepScheduler pair used by the
reference ("dpm" scheduler choice, /root/reference/modules/inversion/
diffusion_inversion.py:139-165 and modules/inverse_schedulers/
scheduling_dpmsolver_multistep_inverse.py).  dpmsolver++ algorithm, epsilon
prediction, solver orders 1/2/3 with diffusers' lower_order_final ramp-down
(order 1 on the final step, ≤2 on the second-last); the multistep state (two
previous converted model outputs + order counter) is an explicit pytree
carried through the diffusion scan instead of scheduler-object attributes
(reference :130-132).

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
        "dpm_m_prev": jnp.zeros(latent_shape, dtype),   # previous x0 prediction
        "dpm_t_prev": jnp.asarray(-1, jnp.int32),       # its timestep
        "dpm_m_prev2": jnp.zeros(latent_shape, dtype),  # second-previous x0
        "dpm_t_prev2": jnp.asarray(-1, jnp.int32),
        "dpm_low": jnp.asarray(0, jnp.int32),           # lower_order_nums
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

    # third order: two previous x0 predictions (diffusers
    # multistep_dpm_solver_third_order_update, dpmsolver++ branch; reference
    # inverse order dispatch scheduling_dpmsolver_multistep_inverse.py:142-155)
    m2 = state["dpm_m_prev2"]
    lam_s2 = _lambda(schedule, jnp.maximum(state["dpm_t_prev2"], 0))
    h_1 = lam_s1 - lam_s2
    r1 = h_1 / h
    d1_0 = d1  # (m0 - m1)/r0 from the second-order branch
    d1_1 = (m1 - m2) / jnp.where(r1 == 0, 1.0, r1)
    rsum = jnp.where(r0 + r1 == 0, 1.0, r0 + r1)
    d1_3 = d1_0 + (r0 / rsum) * (d1_0 - d1_1)
    d2 = (d1_0 - d1_1) / rsum
    x_third = (s_p / s_t) * latent \
        - a_p * (jnp.exp(-h) - 1.0) * m0 \
        + a_p * ((jnp.exp(-h) - 1.0) / h + 1.0) * d1_3 \
        - a_p * ((jnp.exp(-h) - 1.0 + h) / (h * h) - 0.5) * d2

    use_first = jnp.logical_or(state["dpm_low"] < 1, jnp.asarray(solver_order == 1))
    use_second = jnp.logical_or(state["dpm_low"] < 2, jnp.asarray(solver_order <= 2))
    if lower_order_final and schedule.num_inference_steps < 15:
        use_first = jnp.logical_or(use_first, is_last)
        use_second = jnp.logical_or(use_second, is_second_last)
    new_latent = jnp.where(use_first, x_first,
                           jnp.where(use_second, x_second, x_third))

    new_state = {
        "dpm_m_prev": m0,
        "dpm_t_prev": jnp.asarray(t, jnp.int32),
        "dpm_m_prev2": m1,
        "dpm_t_prev2": state["dpm_t_prev"],
        "dpm_low": jnp.minimum(state["dpm_low"] + 1, solver_order),
    }
    return new_latent, new_state
