from depth_completion_tpu.sched.ddim import (
    DDIMConfig,
    DiffusionSchedule,
    ddim_step,
    make_schedule,
    make_timesteps,
    pred_epsilon,
    pred_original,
)
from depth_completion_tpu.sched.lcm import LCMConfig, lcm_step, make_lcm_timesteps

__all__ = [
    "DDIMConfig",
    "DiffusionSchedule",
    "ddim_step",
    "make_schedule",
    "make_timesteps",
    "pred_epsilon",
    "pred_original",
    "LCMConfig",
    "lcm_step",
    "make_lcm_timesteps",
]
