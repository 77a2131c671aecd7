from .schedules import (
    append_zero,
    cosine_beta_schedule,
    get_iddpm_sigmas,
    get_noise_schedule,
    get_sigmas_exponential,
    get_sigmas_karras,
    get_sigmas_linear,
    get_sigmas_ve,
    get_sigmas_vp,
)
from .densities import (
    make_sample_density,
    rand_discrete,
    rand_log_logistic,
    rand_log_normal,
    rand_log_uniform,
    rand_split_log_normal,
    rand_uniform,
    rand_v_diffusion,
)
from .precond import append_dims, get_scalings, precond_denoise, precond_loss
from .samplers import SAMPLER_NAMES, sample_loop
