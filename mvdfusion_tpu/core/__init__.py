from mvdfusion_tpu.core.schedule import (
    DDIMSchedule,
    DDPMSchedule,
    ddim_step,
    make_ddim_schedule,
    make_ddim_timesteps,
    make_ddpm_schedule,
    predict_start_from_noise,
    q_sample,
)

__all__ = [
    "DDIMSchedule",
    "DDPMSchedule",
    "ddim_step",
    "make_ddim_schedule",
    "make_ddim_timesteps",
    "make_ddpm_schedule",
    "predict_start_from_noise",
    "q_sample",
]
