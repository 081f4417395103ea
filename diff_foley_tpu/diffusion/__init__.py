from .schedule import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
)
