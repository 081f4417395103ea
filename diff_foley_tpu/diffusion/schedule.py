"""Noise-schedule math for the latent diffusion runtime.

Behavioural spec: reference `diff_foley/modules/diffusionmodules/util.py:21-99`
and `diff_foley/models/diffusion/ddpm.py:122-174` (register_schedule).  All
schedule tables are computed in float64 on host (numpy) and materialised as
float32 device constants, mirroring the reference's
``torch.linspace(..., dtype=float64)`` + ``.numpy()`` pipeline so the α̅ tables
agree bit-for-bit after the float32 cast.

Everything at runtime is functional: a frozen :class:`DiffusionSchedule`
carries the tables; ``q_sample`` etc. are pure jax functions suitable for use
under ``jit`` / ``scan`` / ``grad``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """β-schedule table in float64 (reference util.py:21-43)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """Strided timestep subset for DDIM (reference util.py:46-60).

    The +1 offset reproduces the reference's "final alpha values right" shift.
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(ddim_discr_method)
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """(σ, α, α_prev) tables for a DDIM run (reference util.py:63-74)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def _bcast(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather a[t] and broadcast to an ndim-rank tensor (util.py:96-99)."""
    out = jnp.take(a, t, axis=0)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable bundle of the DDPM forward-process tables.

    Mirrors the buffers registered by reference ``DDPM.register_schedule``
    (ddpm.py:122-174), including the v_posterior=0 posterior variance and the
    'eps' parameterization loss weights.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    linear_start: float = dataclasses.field(metadata=dict(static=True))
    linear_end: float = dataclasses.field(metadata=dict(static=True))

    # ---- pytree plumbing ------------------------------------------------
    def tree_flatten(self):
        fields = dataclasses.fields(self)
        dynamic = [getattr(self, f.name) for f in fields if not f.metadata.get("static")]
        static = tuple(getattr(self, f.name) for f in fields if f.metadata.get("static"))
        return dynamic, static

    @classmethod
    def tree_unflatten(cls, static, dynamic):
        fields = dataclasses.fields(cls)
        kwargs = {}
        di, si = iter(dynamic), iter(static)
        for f in fields:
            kwargs[f.name] = next(si) if f.metadata.get("static") else next(di)
        return cls(**kwargs)

    # ---- construction ----------------------------------------------------
    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(
            np.maximum(posterior_variance, 1e-20)
        )
        posterior_mean_coef1 = (
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

        if parameterization == "eps":
            # posterior_variance[0] == 0 → inf at index 0; the reference hits
            # the same and overwrites weight 0 with weight 1 (ddpm.py:172-173)
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (
                2.0 * (1 - alphas_cumprod)
            )
        else:
            raise NotImplementedError(parameterization)
        # reference ddpm.py:172-173: first weight copied from the second
        lvlb_weights = np.array(lvlb_weights)
        lvlb_weights[0] = lvlb_weights[1]

        as_dev = lambda a: jnp.asarray(np.asarray(a, dtype=np.float32), dtype=dtype)
        return cls(
            betas=as_dev(betas),
            alphas_cumprod=as_dev(alphas_cumprod),
            alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
            sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=as_dev(posterior_variance),
            posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
            posterior_mean_coef1=as_dev(posterior_mean_coef1),
            posterior_mean_coef2=as_dev(posterior_mean_coef2),
            lvlb_weights=as_dev(lvlb_weights),
            num_timesteps=int(timesteps),
            linear_start=float(linear_start),
            linear_end=float(linear_end),
        )

    # ---- forward process -------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """Diffuse x_0 to x_t (reference ddpm.py:279-282)."""
        return (
            _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _bcast(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_mean_variance(self, x_start, t):
        mean = _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _bcast(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _bcast(self.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def predict_start_from_noise(self, x_t, t, noise):
        return (
            _bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def predict_eps_from_start(self, x_t, t, x0):
        return (
            _bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / _bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def q_posterior(self, x_start, x_t, t):
        """Posterior q(x_{t-1} | x_t, x_0) (reference ddpm.py:330-337)."""
        mean = (
            _bcast(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _bcast(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = _bcast(self.posterior_variance, t, x_t.ndim)
        log_var = _bcast(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var


def extract_into_tensor(a: jnp.ndarray, t: jnp.ndarray, x_shape) -> jnp.ndarray:
    """Functional analogue of reference util.py:96-99."""
    return _bcast(a, t, len(x_shape))


@partial(jax.jit, static_argnames=("dim", "max_period"))
def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] order (util.py:151-171)."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
