from dvd_tpu.diffusion.schedule import (
    DiffusionSchedule,
    cosine_betas,
    linear_betas,
    make_schedule,
    space_timesteps,
)

__all__ = [
    "DiffusionSchedule",
    "cosine_betas",
    "linear_betas",
    "make_schedule",
    "space_timesteps",
]
