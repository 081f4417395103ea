from .schedule import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    timestep_embedding,
)
from .samplers import (
    ddim_sample,
    ddim_stochastic_encode,
    ddim_decode,
    dpm_solver_sample,
    plms_sample,
)
from .guidance import GuidanceSpec, make_guided_eps_fn

# NOTE: LatentDiffusion/LDMConfig live in diffusion.latent_diffusion and are
# deliberately not re-exported here — latent_diffusion imports the model zoo,
# which imports diffusion.schedule, and a package-level re-export would make
# that cycle load-order dependent.
