from lm2a_tpu.diffusion.gaussian import (
    ddim_sample,
    ddpm_sample,
    diffusion_loss,
    guided_eps,
    make_sampler,
    p_sample_step,
    q_sample,
)
from lm2a_tpu.diffusion.schedule import Schedule, make_schedule

__all__ = [
    "ddim_sample",
    "ddpm_sample",
    "diffusion_loss",
    "guided_eps",
    "make_sampler",
    "p_sample_step",
    "q_sample",
    "Schedule",
    "make_schedule",
]
