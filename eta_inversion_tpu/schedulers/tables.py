"""Diffusion noise-schedule tables.

TPU-native replacement for the stateful diffusers scheduler objects used by the
reference (cfg at /root/reference/modules/models/__init__.py:134: beta_start=0.00085,
beta_end=0.012, beta_schedule="scaled_linear", clip_sample=False,
set_alpha_to_one=False).  Everything here is a precomputed table + pure functions so
that scheduler steps can live inside `jax.lax.scan` bodies with no Python state.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Static configuration of the diffusion noise schedule."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    steps_offset: int = 0
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"

    def make_betas(self) -> np.ndarray:
        if self.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    self.beta_start ** 0.5,
                    self.beta_end ** 0.5,
                    self.num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        elif self.beta_schedule == "linear":
            betas = np.linspace(
                self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float64
            )
        else:
            raise ValueError(f"unknown beta schedule {self.beta_schedule}")
        return betas.astype(np.float32)


class DiffusionSchedule:
    """Precomputed alpha-bar tables + timestep grids for an n-step diffusion.

    All scheduler step functions take this object; `alphas_cumprod` is a device
    array so that `alpha_at(t)` works with traced integer timesteps inside scans
    (replacing the reference's Python-level `alphas_cumprod[t] if t >= 0 else
    final_alpha_cumprod`, /root/reference/modules/inverse_schedulers/
    scheduling_ddim_inverse.py:91-92).
    """

    def __init__(self, config: ScheduleConfig = ScheduleConfig(), num_inference_steps: int = 50):
        self.config = config
        self.num_inference_steps = int(num_inference_steps)
        betas = config.make_betas()
        alphas = 1.0 - betas.astype(np.float64)
        alphas_cumprod = np.cumprod(alphas)
        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        self.alphas = jnp.asarray(alphas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        final = 1.0 if config.set_alpha_to_one else float(alphas_cumprod[0])
        self.final_alpha_cumprod = jnp.asarray(final, dtype=jnp.float32)
        self.step_ratio = config.num_train_timesteps // self.num_inference_steps

        # diffusers DDIMScheduler.set_timesteps semantics:
        #   timesteps = (arange(n) * step_ratio).round()[::-1] + steps_offset
        ts = (np.arange(0, self.num_inference_steps) * self.step_ratio).round()[::-1]
        ts = ts.astype(np.int32) + config.steps_offset
        self._bwd_timesteps = ts  # descending (e.g. 980, 960, ..., 0)

    # -- timestep grids ---------------------------------------------------------

    @property
    def timesteps_backward(self) -> np.ndarray:
        """Denoising timesteps, descending (host numpy; fed to scans as jnp)."""
        return self._bwd_timesteps.copy()

    def timesteps_forward(self, inv_steps: str = "sameshift") -> np.ndarray:
        """Inversion timesteps, ascending.

        `inv_steps` mirrors the reference's three timestep-indexing modes
        (/root/reference/modules/inverse_schedulers/scheduling_ddim_inverse.py:115-143):
          - sameshift (default): UNet evaluated at t, DDIM step t-Δ → t
          - samesame: UNet at t, step t → t+Δ
          - shiftshift: timestep grid shifted down by Δ, step t → t+Δ
        """
        steps = self._bwd_timesteps[::-1].copy()
        if inv_steps == "shiftshift":
            steps = steps - self.step_ratio
        return steps

    # -- table lookups (trace-safe) --------------------------------------------

    def alpha_at(self, t) -> jnp.ndarray:
        """alphas_cumprod[t], with t<0 mapping to final_alpha_cumprod and t>max
        clamped (reference clamps at 999)."""
        t = jnp.asarray(t)
        tc = jnp.clip(t, 0, self.config.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[tc], self.final_alpha_cumprod)

    def prev_timestep(self, t):
        return t - self.step_ratio

    def variance(self, t) -> jnp.ndarray:
        """DDIM sampling variance at timestep t
        ((beta_prev/beta) * (1 - a_t/a_prev), see reference
        ddpm_inverse_scheduler.py:65-84 / diffusers DDIMScheduler._get_variance)."""
        alpha_prod_t = self.alpha_at(t)
        alpha_prod_t_prev = self.alpha_at(self.prev_timestep(t))
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)

    # convenience pair used by scaled-timestep schedulers (DPM)
    def sigma_alpha_tables(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        alpha_t = jnp.sqrt(self.alphas_cumprod)
        sigma_t = jnp.sqrt(1.0 - self.alphas_cumprod)
        return alpha_t, sigma_t
