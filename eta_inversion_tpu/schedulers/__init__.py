from .tables import DiffusionSchedule, ScheduleConfig
from .ddim import ddim_step, ddim_inverse_step, ddim_backward_step, pred_x0
from .ddpm_inverse import sample_trajectory, ddpm_inverse_step

__all__ = [
    "DiffusionSchedule", "ScheduleConfig", "ddim_step", "ddim_inverse_step",
    "ddim_backward_step", "pred_x0", "sample_trajectory", "ddpm_inverse_step",
]
