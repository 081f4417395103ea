"""Samplers as single-jit `lax.scan` loops: DDIM, DPM-Solver++(2M), PLMS.

Behavioural specs (all verified against the reference math, file:line cited
per function):

- DDIM: `diff_foley/models/diffusion/ddim.py` — uniform (+1 offset) timestep
  subset, η-sigmas, ε-parameterized update.
- DPM-Solver++(2M): `dpm_solver/dpm_solver.py` + `sampler.py:83,154` — the
  shipped inference path: NoiseScheduleVP('discrete'), predict_x0=True,
  multistep order 2, time_uniform grid, lower_order_final, solver_type
  'dpm_solver'. All λ/α/σ tables are precomputed host-side in float64 from
  the discrete ᾱ table, so the on-device loop is pure arithmetic between
  model calls.
- PLMS: `plms.py` — Adams-Bashforth on the ε history (orders 1→4).

Every sampler takes a *guided* eps_fn built by diffusion.guidance, giving
"CFG + double guidance fused per step" inside one compiled scan.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import (
    DiffusionSchedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

# eps_fn(x, t_model_vec, s_t) -> eps   (s_t: classifier-grad scale for this t)
EpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


# --------------------------------------------------------------------------
# DDIM
# --------------------------------------------------------------------------

def ddim_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    steps: int = 25,
    eta: float = 0.0,
    temperature: float = 1.0,
    discr_method: str = "uniform",
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    mask_noise: Optional[jnp.ndarray] = None,
    noise_dropout: float = 0.0,
    score_corrector=None,
    denoised_fn=None,
) -> jnp.ndarray:
    """DDIM sampling loop (ddim.py:232-316 / 345-396).

    Classifier-grad scale per step is √(1−ᾱ_t) (ddim.py:368,380).
    discr_method: 'uniform' or 'quad' timestep spacing (util.py:46-53).

    Latent surface hooks of the reference loop:
    - ``mask``/``x0`` inpainting (ddim.py:210-213): before each model call the
      known region is re-imposed as ``q_sample(x0, t)·mask + (1−mask)·x`` —
      mask=1 marks KNOWN pixels kept from x0, mask=0 regions are generated.
      ``mask_noise`` optionally fixes the forward-diffusion noise: an array of
      shape (steps, *x.shape) used per step (deterministic forward pass — the
      reference's own "TODO" at ddim.py:211), else fresh noise per step.
    - ``noise_dropout`` (ddim.py:234-236): train-mode dropout on the η-noise
      (zero with prob p, rescale 1/(1−p)) — only meaningful when eta > 0.
    - ``score_corrector(e_t, x, t_vec) -> e_t`` (ddim.py:246-248): post-CFG
      ε-correction hook (modify_score semantics).
    - ``denoised_fn(pred_x0) -> pred_x0``: per-step x₀ hook, the generic form
      of the reference's quantize_denoised (its VQ first stage is dead code —
      NameError by construction — so only the hook shape is kept).
    """
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps(discr_method, steps, schedule.num_timesteps)
    steps = len(ts)  # uniform stride may over-produce (util.py:48-49 semantics)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta)
    sqrt_one_minus = np.sqrt(1.0 - alphas)

    if mask is not None:
        assert x0 is not None, "mask inpainting needs x0 (ddim.py:210)"

    # iterate reversed (T→0)
    order = slice(None, None, -1)
    tbl = dict(
        t=jnp.asarray(ts[order], jnp.float32),
        ti=jnp.asarray(ts[order], jnp.int32),
        a=jnp.asarray(alphas[order], jnp.float32),
        a_prev=jnp.asarray(alphas_prev[order], jnp.float32),
        sigma=jnp.asarray(sigmas[order], jnp.float32),
        s1ma=jnp.asarray(sqrt_one_minus[order], jnp.float32),
    )
    keys = jax.random.split(key, steps)
    xs = (tbl, keys, mask_noise) if mask_noise is not None else (tbl, keys)

    def step(x, per_step):
        if mask_noise is not None:
            c, k, q_noise = per_step
        else:
            c, k = per_step
            q_noise = None
        b = x.shape[0]
        t_vec = jnp.full((b,), c["t"], x.dtype)
        if mask is not None:
            # re-impose the known region at this noise level (ddim.py:210-213)
            if q_noise is None:
                q_noise = jax.random.normal(
                    jax.random.fold_in(k, 1), x0.shape, x0.dtype
                )
            ti_vec = jnp.full((b,), c["ti"], jnp.int32)
            x_orig = schedule.q_sample(x0, ti_vec, q_noise)
            x = (x_orig * mask + (1.0 - mask) * x).astype(x.dtype)
        e_t = eps_fn(x, t_vec, c["s1ma"])
        if score_corrector is not None:
            e_t = score_corrector(e_t, x, t_vec)
        pred_x0 = (x - c["s1ma"] * e_t) / jnp.sqrt(c["a"])
        if denoised_fn is not None:
            pred_x0 = denoised_fn(pred_x0)
        dir_xt = jnp.sqrt(1.0 - c["a_prev"] - c["sigma"] ** 2) * e_t
        noise = c["sigma"] * jax.random.normal(k, x.shape, x.dtype) * temperature
        if noise_dropout > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(k, 2), 1.0 - noise_dropout, x.shape
            )
            noise = noise * keep / (1.0 - noise_dropout)
        # cast back: the fp32 table scalars would otherwise promote a bf16
        # carry and break the scan's carry-dtype invariance
        x_new = jnp.sqrt(c["a_prev"]) * pred_x0 + dir_xt + noise
        return x_new.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x_T, xs)
    return x


def ddim_stochastic_encode(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t_index: jnp.ndarray,
    key: jax.Array,
    steps: int = 25,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Diffuse x0 forward to DDIM step index t (ddim.py:399-413) — the
    img2img entry point."""
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps("uniform", steps, schedule.num_timesteps)
    _, alphas, _ = make_ddim_sampling_parameters(ac, ts, 0.0)
    sqrt_a = jnp.asarray(np.sqrt(alphas), jnp.float32)
    sqrt_1ma = jnp.asarray(np.sqrt(1.0 - alphas), jnp.float32)
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    expand = lambda a: a[t_index].reshape(-1, *([1] * (x0.ndim - 1)))
    return expand(sqrt_a) * x0 + expand(sqrt_1ma) * noise


def ddim_decode(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_latent: jnp.ndarray,
    t_start: int,
    steps: int = 25,
) -> jnp.ndarray:
    """Deterministic DDIM decode from step index t_start (ddim.py:415-433):
    the second half of img2img after ddim_stochastic_encode."""
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps("uniform", steps, schedule.num_timesteps)
    assert 1 <= t_start <= len(ts), (t_start, len(ts))
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, 0.0)
    sqrt_one_minus = np.sqrt(1.0 - alphas)

    sel = slice(t_start - 1, None, -1)  # indices t_start-1 … 0
    tbl = dict(
        t=jnp.asarray(ts[sel].copy(), jnp.float32),
        a=jnp.asarray(alphas[sel], jnp.float32),
        a_prev=jnp.asarray(alphas_prev[sel], jnp.float32),
        s1ma=jnp.asarray(sqrt_one_minus[sel], jnp.float32),
    )

    def step(x, c):
        b = x.shape[0]
        t_vec = jnp.full((b,), c["t"], x.dtype)
        e_t = eps_fn(x, t_vec, c["s1ma"])
        pred_x0 = (x - c["s1ma"] * e_t) / jnp.sqrt(c["a"])
        dir_xt = jnp.sqrt(1.0 - c["a_prev"]) * e_t
        x_new = jnp.sqrt(c["a_prev"]) * pred_x0 + dir_xt
        return x_new.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x_latent, tbl)
    return x


# --------------------------------------------------------------------------
# Ancestral DDPM sampling + progressive denoising
# --------------------------------------------------------------------------

def _ancestral_scan(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    *,
    num_steps: int,
    collect: str,  # 'x' (p_sample_loop) | 'x0' (progressive_denoising) | ''
    clip_denoised: bool,
    temperature,
    noise_dropout: float,
    mask, x0, mask_noise,
    log_every_t: int,
    score_corrector, denoised_fn,
):
    """Shared body of p_sample_loop / progressive_denoising: one `lax.scan`
    over descending timesteps t = num_steps−1 … 0, each step an ancestral
    posterior draw (ddpm.py:1065-1145 p_mean_variance + p_sample).

    Intermediates are collected into a preallocated buffer via per-step
    scatter writes at host-precomputed slots — static shapes, no python
    appends inside the compiled loop.
    """
    T = num_steps
    b = x_T.shape[0]
    ts_desc = np.arange(T - 1, -1, -1)

    # host-side: which iterations log, and into which slot. The reference's
    # condition is on the timestep VALUE: `i % log_every_t == 0 or
    # i == timesteps - 1` with i the descending t (ddpm.py:1249) — so the
    # first iteration (t = T−1) always logs.
    logged = [(int(t) == T - 1) or (int(t) % log_every_t == 0)
              for t in ts_desc]
    slots = np.zeros(T, np.int32)
    base = 1 if collect == "x" else 0  # p_sample_loop pre-seeds [x_T]
    nxt = base
    for i, lg in enumerate(logged):
        if lg:
            slots[i] = nxt
            nxt += 1
    n_slots = nxt

    if isinstance(temperature, (int, float)):
        temp_by_t = np.full(T, float(temperature))
    else:
        temp_by_t = np.asarray(temperature, np.float64)[:T]
    # scan order is descending t, so index the per-t tables accordingly
    tbl = dict(
        t=jnp.asarray(ts_desc, jnp.int32),
        temp=jnp.asarray(temp_by_t[ts_desc], jnp.float32),
        s1ma=jnp.take(
            schedule.sqrt_one_minus_alphas_cumprod, jnp.asarray(ts_desc)
        ),
        do_log=jnp.asarray(logged, jnp.bool_),
        slot=jnp.asarray(slots, jnp.int32),
    )
    keys = jax.random.split(key, T)
    xs = (tbl, keys, mask_noise) if mask_noise is not None else (tbl, keys)

    inter0 = (
        jnp.zeros((n_slots, *x_T.shape), x_T.dtype)
        if collect
        else jnp.zeros((0,), x_T.dtype)
    )
    if collect == "x":
        inter0 = inter0.at[0].set(x_T)

    def step(carry, per_step):
        x, inter = carry
        if mask_noise is not None:
            c, k, q_noise = per_step
        else:
            c, k = per_step
            q_noise = None
        t_vec = jnp.full((b,), c["t"], jnp.int32)
        eps = eps_fn(x, t_vec.astype(x.dtype), c["s1ma"])
        if score_corrector is not None:
            eps = score_corrector(eps, x, t_vec)
        x_recon = schedule.predict_start_from_noise(x, t_vec, eps)
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        if denoised_fn is not None:
            x_recon = denoised_fn(x_recon)
        mean, _, log_var = schedule.q_posterior(x_recon, x, t_vec)
        noise = jax.random.normal(k, x.shape, x.dtype) * c["temp"]
        if noise_dropout > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(k, 2), 1.0 - noise_dropout, x.shape
            )
            noise = noise * keep / (1.0 - noise_dropout)
        nonzero = (c["t"] != 0).astype(x.dtype)  # no noise at t=0
        x_new = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        if mask is not None:
            # blend AFTER the posterior step (ddpm.py:1196-1198, 1246-1248 —
            # note the DDIM loop blends BEFORE its update instead)
            if q_noise is None:
                q_noise = jax.random.normal(
                    jax.random.fold_in(k, 1), x0.shape, x0.dtype
                )
            x_orig = schedule.q_sample(x0, t_vec, q_noise)
            x_new = x_orig * mask + (1.0 - mask) * x_new
        x_new = x_new.astype(x.dtype)
        if collect:
            val = x_new if collect == "x" else x_recon.astype(x.dtype)
            cur = inter[c["slot"]]
            inter = inter.at[c["slot"]].set(jnp.where(c["do_log"], val, cur))
        return (x_new, inter), None

    (x, inter), _ = jax.lax.scan(step, (x_T, inter0), xs)
    return x, inter


def p_sample_loop(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: Optional[int] = None,
    start_T: Optional[int] = None,
    clip_denoised: bool = False,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    mask_noise: Optional[jnp.ndarray] = None,
    log_every_t: int = 100,
    return_intermediates: bool = False,
    score_corrector=None,
    denoised_fn=None,
):
    """Ancestral DDPM sampling (ddpm.py:1205-1253 LatentDiffusion.p_sample_loop
    / ddpm.py:249-270 base loop) as one compiled scan.

    Per step t = T−1 … 0: ε-model → predict x₀ (optional [-1,1] clip) →
    posterior q(x_{t−1}|x_t,x₀) mean + exp(½·logvar)·noise draw (no noise at
    t=0), then the optional mask/x0 known-region re-blend. `timesteps`/
    `start_T` truncate the chain (both reference kwargs); intermediates are
    the running x at every `log_every_t` (plus the first step), seeded with
    x_T — exactly the reference's list. `temperature` may be a scalar or a
    per-timestep array (indexed by t); the base reference loop fixes it at 1.

    clip_denoised defaults False — LatentDiffusion sets it so (ddpm.py:520);
    the pixel-space DDPM base class defaults True.

    Returns x, or (x, intermediates) when return_intermediates.
    """
    T = schedule.num_timesteps if timesteps is None else int(timesteps)
    if start_T is not None:
        T = min(T, int(start_T))
    if mask is not None:
        assert x0 is not None, "mask inpainting needs x0 (ddpm.py:1230)"
    x, inter = _ancestral_scan(
        eps_fn, schedule, x_T, key, num_steps=T,
        collect="x" if return_intermediates else "",
        clip_denoised=clip_denoised, temperature=temperature,
        noise_dropout=noise_dropout, mask=mask, x0=x0, mask_noise=mask_noise,
        log_every_t=log_every_t, score_corrector=score_corrector,
        denoised_fn=denoised_fn,
    )
    if return_intermediates:
        return x, inter
    return x


def progressive_denoising(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    key: jax.Array,
    *,
    timesteps: Optional[int] = None,
    start_T: Optional[int] = None,
    clip_denoised: bool = False,
    temperature=1.0,
    noise_dropout: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    mask_noise: Optional[jnp.ndarray] = None,
    log_every_t: int = 100,
    score_corrector=None,
    denoised_fn=None,
):
    """Progressive denoising (ddpm.py:1146-1203): the ancestral chain that
    collects the per-step x₀ PREDICTIONS (return_x0=True) instead of the
    running sample — the "how the estimate sharpens over t" diagnostic row
    the reference renders in its loggers.

    Returns (x, x0_partials) where x0_partials stacks the predicted x₀ at
    every `log_every_t` (plus the first step); unlike p_sample_loop the list
    is NOT seeded with x_T (ddpm.py:1163).
    """
    T = schedule.num_timesteps if timesteps is None else int(timesteps)
    if start_T is not None:
        T = min(T, int(start_T))
    if mask is not None:
        assert x0 is not None, "mask inpainting needs x0 (ddpm.py:1195)"
    return _ancestral_scan(
        eps_fn, schedule, x_T, key, num_steps=T, collect="x0",
        clip_denoised=clip_denoised, temperature=temperature,
        noise_dropout=noise_dropout, mask=mask, x0=x0, mask_noise=mask_noise,
        log_every_t=log_every_t, score_corrector=score_corrector,
        denoised_fn=denoised_fn,
    )


# --------------------------------------------------------------------------
# DPM-Solver library — multistep / singlestep / singlestep_fixed / adaptive,
# orders 1-3, both model parameterisations, dynamic thresholding.
#
# The shipped inference operating point (sampler.py:83,154) is
# method='multistep', order=2, time_uniform, predict_x0, lower_order_final —
# the defaults of dpm_solver_sample below.  Everything beyond it mirrors the
# general library at dpm_solver.py:351-675.
#
# TPU-first design: every non-adaptive mode has a STATIC time grid, so all
# schedule math (NoiseScheduleVP marginals, λ↔t inversion, per-step update
# coefficients) is precomputed host-side in float64 and the on-device program
# is model calls + a handful of fused scalar·tensor ops — multistep as one
# `lax.scan`, singlestep unrolled (≤ steps model calls).  Only the adaptive
# controller (data-dependent step size, dpm_solver.py:460-514) runs its
# schedule math on device, inside a `lax.while_loop`.
# --------------------------------------------------------------------------

class _NSMath:
    """NoiseScheduleVP('discrete') marginal functions (dpm_solver.py:95-175).

    Parameterised by the array module: `np` (float64, host-side grid
    precompute) or `jnp` (on-device, adaptive mode). Piecewise-linear
    interpolation over the (t, log ᾱ^½) table matches the reference's
    interpolate_fn within the table bounds (all sampling times lie inside).
    """

    def __init__(self, xp, alphas_cumprod):
        self.xp = xp
        ac = np.asarray(alphas_cumprod, dtype=np.float64)
        self.N = len(ac)
        self.T = 1.0
        la = 0.5 * np.log(ac)                       # log α_t at t=(i+1)/N
        ta = np.linspace(0.0, 1.0, self.N + 1)[1:]
        if xp is jnp:
            self.t_arr = jnp.asarray(ta, jnp.float32)
            self.la_arr = jnp.asarray(la, jnp.float32)
        else:
            self.t_arr, self.la_arr = ta, la

    def log_mean_coeff(self, t):
        return self.xp.interp(t, self.t_arr, self.la_arr)

    def alpha(self, t):
        return self.xp.exp(self.log_mean_coeff(t))

    def std(self, t):
        return self.xp.sqrt(1.0 - self.xp.exp(2.0 * self.log_mean_coeff(t)))

    def lam(self, t):
        la = self.log_mean_coeff(t)
        return la - 0.5 * self.xp.log(1.0 - self.xp.exp(2.0 * la))

    def inv_lam(self, lamb):
        # λ → log α → t, over the flipped (ascending) table (dpm_solver.py:166-171)
        la = -0.5 * self.xp.logaddexp(
            self.xp.zeros_like(lamb) if self.xp is jnp else 0.0, -2.0 * lamb
        )
        return self.xp.interp(la, self.la_arr[::-1], self.t_arr[::-1])

    def t_model(self, t):
        # get_model_input_time for discrete schedules (dpm_solver.py:249-257)
        return (t - 1.0 / self.N) * 1000.0


def _get_time_steps(ns: _NSMath, skip_type: str, t_T: float, t_0: float, N: int):
    """Sampling time grid (dpm_solver.py:409-434), host-side float64."""
    if skip_type == "logSNR":
        lam_grid = np.linspace(ns.lam(t_T), ns.lam(t_0), N + 1)
        return ns.inv_lam(lam_grid)
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
    raise ValueError(f"unsupported skip_type '{skip_type}'")


def _threshold(x0: jnp.ndarray, max_val: float) -> jnp.ndarray:
    """Imagen dynamic thresholding (dpm_solver.py:373-381): clamp x0 to the
    per-sample p=0.995 quantile of |x0| (floored at max_val) and renormalise."""
    flat = jnp.abs(x0).reshape(x0.shape[0], -1)
    s = jnp.quantile(flat, 0.995, axis=1)
    s = jnp.maximum(s, max_val).reshape(-1, *([1] * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s


def _bc(v, ndim: int):
    """Broadcast a (B,)-shaped on-device coefficient over trailing axes;
    host-side python-float coefficients pass through (weakly typed)."""
    if isinstance(v, jnp.ndarray) and v.ndim == 1:
        return v.reshape(-1, *([1] * (ndim - 1)))
    return v


class _DPMModel:
    """eps_fn + schedule → the solver's model function m(x, t):
    ε itself (predict_x0=False) or the (optionally thresholded) data
    prediction (dpm_solver.py:385-408). Classifier-guidance scale = σ_t
    (model_wrapper_with_classifier, dpm_solver.py:1392).

    `model_type` mirrors model_wrapper's parameterisations
    (dpm_solver.py:177-349, assert at :349): the wrapped network may
    predict "noise" (ε, the shipped Diff-Foley case), "x_start" (x₀), or
    "v" (velocity); the raw output is converted to ε first — the same
    order of operations as the reference's noise_pred_fn → model_fn —
    before the solver's ε→x₀ conversion. This conversion is for RAW
    (unguided) model functions handed straight to dpm_solver_sample;
    guided fns built by LatentDiffusion.sample arrive already converted
    (guidance must compose AFTER the conversion — guidance.py), so the
    LDM path always passes model_type="noise" down here."""

    def __init__(self, eps_fn, predict_x0, thresholding, max_val,
                 model_type="noise"):
        if model_type not in ("noise", "x_start", "v"):
            raise ValueError(
                f"model_type must be 'noise', 'x_start' or 'v' "
                f"(dpm_solver.py:349), got {model_type!r}")
        self.eps_fn = eps_fn
        self.predict_x0 = predict_x0
        self.thresholding = thresholding
        self.max_val = max_val
        self.model_type = model_type

    def __call__(self, x, t_model, alpha_t, sigma_t):
        b = x.shape[0]
        t_vec = (
            jnp.full((b,), t_model, x.dtype)
            if not (isinstance(t_model, jnp.ndarray) and t_model.ndim == 1)
            else t_model.astype(x.dtype)
        )
        a_b, s_b = _bc(alpha_t, x.ndim), _bc(sigma_t, x.ndim)
        out = self.eps_fn(x, t_vec, s_b)
        if self.model_type == "x_start":       # ε = (x − α·x₀)/σ  (:303-306)
            eps = (x - a_b * out) / s_b
        elif self.model_type == "v":           # ε = α·v + σ·x     (:307-310)
            eps = a_b * out + s_b * x
        else:
            eps = out
        if not self.predict_x0:
            return eps
        x0 = (x - s_b * eps) / a_b
        if self.thresholding:
            x0 = _threshold(x0, self.max_val)
        return x0


def dpm_solver_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    steps: int = 25,
    *,
    order: int = 2,
    method: str = "multistep",
    skip_type: str = "time_uniform",
    solver_type: str = "dpm_solver",
    predict_x0: bool = True,
    thresholding: bool = False,
    max_val: float = 1.0,
    lower_order_final: bool = True,
    denoise_to_zero: bool = False,
    t_start: Optional[float] = None,
    t_end: Optional[float] = None,
    atol: float = 0.0078,
    rtol: float = 0.05,
    model_type: str = "noise",
) -> jnp.ndarray:
    """DPM-Solver sampling (DPM_Solver.sample, dpm_solver.py:516-675).

    Defaults are the shipped Diff-Foley inference configuration
    (sampler.py:83,154): DPM-Solver++ multistep order 2, uniform time grid,
    lower_order_final. `steps` is the NFE budget (ignored by 'adaptive').
    `model_type` selects the network's parameterisation à la model_wrapper
    (dpm_solver.py:177-349): "noise" (shipped), "x_start", or "v".
    """
    ns = _NSMath(np, schedule.alphas_cumprod)
    t_0 = 1.0 / ns.N if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    model = _DPMModel(eps_fn, predict_x0, thresholding, max_val, model_type)

    if method == "multistep":
        x = _dpm_multistep(
            model, ns, x_T, steps, order, skip_type, solver_type,
            predict_x0, lower_order_final, t_T, t_0,
        )
    elif method in ("singlestep", "singlestep_fixed"):
        x = _dpm_singlestep(
            model, ns, x_T, steps, order, skip_type, method, solver_type,
            predict_x0, t_T, t_0,
        )
    elif method == "adaptive":
        x = _dpm_adaptive(
            model, schedule, x_T, order, solver_type, predict_x0,
            t_T, t_0, atol, rtol,
        )
    else:
        raise ValueError(f"unsupported method '{method}'")

    if denoise_to_zero:
        # final first-order denoise λ→∞ (dpm_solver.py:498-502,673-674)
        x0_model = _DPMModel(eps_fn, True, thresholding, max_val, model_type)
        x = x0_model(x, ns.t_model(t_0), float(ns.alpha(t_0)), float(ns.std(t_0)))
    return x.astype(x_T.dtype)


def _dpm_multistep(
    model, ns, x_T, steps, order, skip_type, solver_type,
    predict_x0, lower_order_final, t_T, t_0,
):
    """Multistep orders 1-3 as ONE masked `lax.scan` (dpm_solver.py:628-656).

    The reference's warm-up (first `order` steps at increasing order) and
    lower_order_final tail are static per-step order choices, so they become
    precomputed coefficient tables: cd1/cd2 are exactly zero where the
    D1/D2 corrections are disabled and the scan body never branches.
    """
    assert steps >= order and 1 <= order <= 3
    if solver_type not in ("dpm_solver", "taylor"):
        raise ValueError(f"unsupported solver_type '{solver_type}'")
    tg = _get_time_steps(ns, skip_type, t_T, t_0, steps)  # (steps+1,) f64
    la_g = ns.log_mean_coeff(tg)
    alpha = np.exp(la_g)
    sigma = np.sqrt(1.0 - np.exp(2.0 * la_g))
    lam = la_g - np.log(sigma)
    t_model = ns.t_model(tg)

    def upd_order(k):  # order of the update landing on grid point k
        if k < order:
            return k
        if lower_order_final and steps < 15:
            return min(order, steps + 1 - k)
        return order

    # Per-scan-step (i = 0..steps-1: model eval at grid i, update i→i+1)
    # coefficients, float64 host-side:  x' = cx·x + cm·m0 + cd1·Deff + cd2·D2
    # with Deff = D1_0 + w3·(D1_0 − D1_1).
    C = {k: np.zeros(steps) for k in
         ("cx", "cm", "cd1", "cd2", "inv_r0", "w3", "inv_r01")}
    for i in range(steps):
        o = upd_order(i + 1)
        h = lam[i + 1] - lam[i]
        if predict_x0:
            phi1 = np.expm1(-h)
            cx = sigma[i + 1] / sigma[i]
            cm = -(alpha[i + 1] * phi1)
            cd1_2dpm = -0.5 * alpha[i + 1] * phi1
            cd1_tay = alpha[i + 1] * (phi1 / h + 1.0)
            cd2 = -(alpha[i + 1] * ((phi1 + h) / h ** 2 - 0.5))
        else:
            phi1 = np.expm1(h)
            cx = np.exp(la_g[i + 1] - la_g[i])
            cm = -(sigma[i + 1] * phi1)
            cd1_2dpm = -0.5 * sigma[i + 1] * phi1
            cd1_tay = -(sigma[i + 1] * (phi1 / h - 1.0))
            cd2 = -(sigma[i + 1] * ((phi1 - h) / h ** 2 - 0.5))
        C["cx"][i], C["cm"][i] = cx, cm
        if o >= 2:
            h0 = lam[i] - lam[i - 1]
            r0 = h0 / h
            C["inv_r0"][i] = 1.0 / r0
            C["cd1"][i] = (
                cd1_tay if (o == 3 or solver_type == "taylor") else cd1_2dpm
            )
        if o == 3:
            h1 = lam[i - 1] - lam[i - 2]
            r1 = h1 / h
            C["w3"][i] = r0 / (r0 + r1)
            C["inv_r01"][i] = 1.0 / (r0 + r1)
            C["cd2"][i] = cd2
    tbl = {k: jnp.asarray(v, jnp.float32) for k, v in C.items()}
    # model evaluation happens at grid index i (= the step's start point)
    tbl["t_model"] = jnp.asarray(t_model[:-1], jnp.float32)
    tbl["alpha"] = jnp.asarray(alpha[:-1], jnp.float32)
    tbl["sigma"] = jnp.asarray(sigma[:-1], jnp.float32)

    # D1_1 = (m1 − m2)/r1 needs 1/r1 per step; zero where order < 3.
    inv_r1 = np.zeros(steps)
    for i in range(steps):
        if upd_order(i + 1) == 3:
            h = lam[i + 1] - lam[i]
            inv_r1[i] = h / (lam[i - 1] - lam[i - 2])
    tbl["inv_r1"] = jnp.asarray(inv_r1, jnp.float32)

    def step(carry, c):
        x, m1, m2 = carry
        m0 = model(x, c["t_model"], c["alpha"], c["sigma"])
        D1_0 = (m0 - m1) * c["inv_r0"]
        D1_1 = (m1 - m2) * c["inv_r1"]
        Deff = D1_0 + c["w3"] * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) * c["inv_r01"]
        x_new = c["cx"] * x + c["cm"] * m0 + c["cd1"] * Deff + c["cd2"] * D2
        # cast back: fp32 table scalars would otherwise promote a bf16 carry
        return (x_new.astype(x.dtype), m0.astype(x.dtype), m1), None

    z = jnp.zeros_like(x_T)
    (x, _, _), _ = jax.lax.scan(step, (x_T, z, z), tbl)
    return x


def _ss_update(model, ns, x, s, t, order, r1, r2, solver_type, predict_x0):
    """One singlestep DPM-Solver update of the given order from time s to t
    (dpm_solver.py:504-758). All schedule coefficients are host-side f64
    floats; only the 1-3 model calls and their combinations run on device."""
    f = float
    lam_s, lam_t = ns.lam(s), ns.lam(t)
    h = lam_t - lam_s
    m_s = model(x, f(ns.t_model(s)), f(ns.alpha(s)), f(ns.std(s)))
    if order == 1:
        if predict_x0:
            x_t = f(ns.std(t) / ns.std(s)) * x - f(ns.alpha(t) * np.expm1(-h)) * m_s
        else:
            x_t = (
                f(np.exp(ns.log_mean_coeff(t) - ns.log_mean_coeff(s))) * x
                - f(ns.std(t) * np.expm1(h)) * m_s
            )
        return x_t.astype(x.dtype)

    s1 = ns.inv_lam(lam_s + r1 * h)
    if predict_x0:
        x_s1 = (
            f(ns.std(s1) / ns.std(s)) * x
            - f(ns.alpha(s1) * np.expm1(-r1 * h)) * m_s
        )
    else:
        x_s1 = (
            f(np.exp(ns.log_mean_coeff(s1) - ns.log_mean_coeff(s))) * x
            - f(ns.std(s1) * np.expm1(r1 * h)) * m_s
        )
    m_s1 = model(
        x_s1.astype(x.dtype), f(ns.t_model(s1)), f(ns.alpha(s1)), f(ns.std(s1))
    )

    if order == 2:
        if predict_x0:
            phi1 = np.expm1(-h)
            cx, base = f(ns.std(t) / ns.std(s)), ns.alpha(t) * phi1
            cd = (
                -(0.5 / r1) * base
                if solver_type == "dpm_solver"
                else (1.0 / r1) * ns.alpha(t) * (phi1 / h + 1.0)
            )
            x_t = cx * x - f(base) * m_s + f(cd) * (m_s1 - m_s)
        else:
            phi1 = np.expm1(h)
            cx = f(np.exp(ns.log_mean_coeff(t) - ns.log_mean_coeff(s)))
            base = ns.std(t) * phi1
            cd = (
                -(0.5 / r1) * base
                if solver_type == "dpm_solver"
                else -(1.0 / r1) * ns.std(t) * (phi1 / h - 1.0)
            )
            x_t = cx * x - f(base) * m_s + f(cd) * (m_s1 - m_s)
        return x_t.astype(x.dtype)

    # order == 3 (dpm_solver.py:617-757)
    s2 = ns.inv_lam(lam_s + r2 * h)
    if predict_x0:
        phi1 = np.expm1(-h)
        phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
        phi_2 = phi1 / h + 1.0
        phi_3 = phi_2 / h - 0.5
        x_s2 = (
            f(ns.std(s2) / ns.std(s)) * x
            - f(ns.alpha(s2) * np.expm1(-r2 * h)) * m_s
            + f(r2 / r1 * ns.alpha(s2) * phi_22) * (m_s1 - m_s)
        )
        m_s2 = model(
            x_s2.astype(x.dtype), f(ns.t_model(s2)), f(ns.alpha(s2)), f(ns.std(s2))
        )
        if solver_type == "dpm_solver":
            x_t = (
                f(ns.std(t) / ns.std(s)) * x
                - f(ns.alpha(t) * phi1) * m_s
                + f((1.0 / r2) * ns.alpha(t) * phi_2) * (m_s2 - m_s)
            )
        else:
            D1_0 = (1.0 / r1) * (m_s1 - m_s)
            D1_1 = (1.0 / r2) * (m_s2 - m_s)
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            x_t = (
                f(ns.std(t) / ns.std(s)) * x
                - f(ns.alpha(t) * phi1) * m_s
                + f(ns.alpha(t) * phi_2) * D1
                - f(ns.alpha(t) * phi_3) * D2
            )
    else:
        phi1 = np.expm1(h)
        phi_22 = np.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        x_s2 = (
            f(np.exp(ns.log_mean_coeff(s2) - ns.log_mean_coeff(s))) * x
            - f(ns.std(s2) * np.expm1(r2 * h)) * m_s
            - f(r2 / r1 * ns.std(s2) * phi_22) * (m_s1 - m_s)
        )
        m_s2 = model(
            x_s2.astype(x.dtype), f(ns.t_model(s2)), f(ns.alpha(s2)), f(ns.std(s2))
        )
        cx = f(np.exp(ns.log_mean_coeff(t) - ns.log_mean_coeff(s)))
        if solver_type == "dpm_solver":
            x_t = (
                cx * x
                - f(ns.std(t) * phi1) * m_s
                - f((1.0 / r2) * ns.std(t) * phi_2) * (m_s2 - m_s)
            )
        else:
            D1_0 = (1.0 / r1) * (m_s1 - m_s)
            D1_1 = (1.0 / r2) * (m_s2 - m_s)
            D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
            D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
            x_t = (
                cx * x
                - f(ns.std(t) * phi1) * m_s
                - f(ns.std(t) * phi_2) * D1
                - f(ns.std(t) * phi_3) * D2
            )
    return x_t.astype(x.dtype)


def _dpm_singlestep(
    model, ns, x_T, steps, order, skip_type, method, solver_type,
    predict_x0, t_T, t_0,
):
    """Singlestep DPM-Solver ('DPM-Solver-fast', dpm_solver.py:536-566,
    657-672): a static order schedule over an outer time grid, each update
    1-3 NFE. The outer loop is unrolled — every grid and coefficient is a
    host-side constant, so the traced program is just `steps` model calls.

    Reference quirk, reproduced deliberately as a working generalisation:
    get_orders_and_timesteps_for_singlestep_solver's non-logSNR branch
    crashes upstream (`torch.cumsum` missing its dim arg, dpm_solver.py:495),
    so for method='singlestep' only skip_type='logSNR' is parity-testable.
    Here the cumsum indexing is implemented correctly for all skip types.
    """
    assert 1 <= order <= 3
    if method == "singlestep":
        if order == 3:
            K = steps // 3 + 1
            orders = {0: [3] * (K - 2) + [2, 1],
                      1: [3] * (K - 1) + [1],
                      2: [3] * (K - 1) + [2]}[steps % 3]
        elif order == 2:
            K = steps // 2
            orders = [2] * K if steps % 2 == 0 else [2] * K + [1]
        else:
            orders = [1] * steps
        if skip_type == "logSNR":
            outer = _get_time_steps(ns, skip_type, t_T, t_0, len(orders))
        else:
            grid = _get_time_steps(ns, skip_type, t_T, t_0, steps)
            outer = grid[np.cumsum([0] + orders)]
    else:  # singlestep_fixed (dpm_solver.py:660-663)
        K = steps // order
        orders = [order] * K
        outer = _get_time_steps(ns, skip_type, t_T, t_0, K)

    x = x_T
    for i, o in enumerate(orders):
        s, t = float(outer[i]), float(outer[i + 1])
        inner = _get_time_steps(ns, skip_type, s, t, o)
        lam_inner = ns.lam(inner)
        h = lam_inner[-1] - lam_inner[0]
        r1 = None if o <= 1 else float((lam_inner[1] - lam_inner[0]) / h)
        r2 = None if o <= 2 else float((lam_inner[2] - lam_inner[0]) / h)
        x = _ss_update(model, ns, x, s, t, o, r1, r2, solver_type, predict_x0)
    return x


def _dpm_adaptive(
    model, schedule, x_T, order, solver_type, predict_x0, t_T, t_0,
    atol, rtol, h_init=0.05, theta=0.9, t_err=1e-5,
):
    """Adaptive step size solver (dpm_solver.py:460-514) as a
    `lax.while_loop`: embedded lower/higher-order singlestep pair, accept
    when the scaled error E ≤ 1, step-size update h ← θ·h·E^(−1/order).

    The step size is data-dependent, so — unlike every other mode — the
    schedule math runs on device (float32 tables)."""
    assert order in (2, 3)
    dns = _NSMath(jnp, schedule.alphas_cumprod)
    b = x_T.shape[0]
    ndim = x_T.ndim

    def dev_ss(x, s_vec, t_vec, ord_, r1, r2):
        """Singlestep update with traced (B,)-shaped times; returns
        (x_t, intermediates-for-reuse)."""
        lam_s, lam_t = dns.lam(s_vec), dns.lam(t_vec)
        h = lam_t - lam_s
        m_s = model(x, dns.t_model(s_vec), dns.alpha(s_vec), dns.std(s_vec))
        if ord_ == 1:
            if predict_x0:
                x_t = (
                    _bc(dns.std(t_vec) / dns.std(s_vec), ndim) * x
                    - _bc(dns.alpha(t_vec) * jnp.expm1(-h), ndim) * m_s
                )
            else:
                x_t = (
                    _bc(jnp.exp(dns.log_mean_coeff(t_vec)
                                - dns.log_mean_coeff(s_vec)), ndim) * x
                    - _bc(dns.std(t_vec) * jnp.expm1(h), ndim) * m_s
                )
            return x_t, (m_s, None)

        s1 = dns.inv_lam(lam_s + r1 * h)
        if predict_x0:
            x_s1 = (
                _bc(dns.std(s1) / dns.std(s_vec), ndim) * x
                - _bc(dns.alpha(s1) * jnp.expm1(-r1 * h), ndim) * m_s
            )
        else:
            x_s1 = (
                _bc(jnp.exp(dns.log_mean_coeff(s1)
                            - dns.log_mean_coeff(s_vec)), ndim) * x
                - _bc(dns.std(s1) * jnp.expm1(r1 * h), ndim) * m_s
            )
        m_s1 = model(x_s1, dns.t_model(s1), dns.alpha(s1), dns.std(s1))

        if ord_ == 2:
            if predict_x0:
                phi1 = jnp.expm1(-h)
                base = dns.alpha(t_vec) * phi1
                cd = (
                    -(0.5 / r1) * base
                    if solver_type == "dpm_solver"
                    else (1.0 / r1) * dns.alpha(t_vec) * (phi1 / h + 1.0)
                )
                x_t = (
                    _bc(dns.std(t_vec) / dns.std(s_vec), ndim) * x
                    - _bc(base, ndim) * m_s + _bc(cd, ndim) * (m_s1 - m_s)
                )
            else:
                phi1 = jnp.expm1(h)
                base = dns.std(t_vec) * phi1
                cd = (
                    -(0.5 / r1) * base
                    if solver_type == "dpm_solver"
                    else -(1.0 / r1) * dns.std(t_vec) * (phi1 / h - 1.0)
                )
                x_t = (
                    _bc(jnp.exp(dns.log_mean_coeff(t_vec)
                                - dns.log_mean_coeff(s_vec)), ndim) * x
                    - _bc(base, ndim) * m_s + _bc(cd, ndim) * (m_s1 - m_s)
                )
            return x_t, (m_s, m_s1)

        # ord_ == 3 (predict_x0 branch; eps-mode mirrors dpm_solver.py:680-718)
        s2 = dns.inv_lam(lam_s + r2 * h)
        if predict_x0:
            phi1 = jnp.expm1(-h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi1 / h + 1.0
            x_s2 = (
                _bc(dns.std(s2) / dns.std(s_vec), ndim) * x
                - _bc(dns.alpha(s2) * jnp.expm1(-r2 * h), ndim) * m_s
                + _bc(r2 / r1 * dns.alpha(s2) * phi_22, ndim) * (m_s1 - m_s)
            )
            m_s2 = model(x_s2, dns.t_model(s2), dns.alpha(s2), dns.std(s2))
            x_t = (
                _bc(dns.std(t_vec) / dns.std(s_vec), ndim) * x
                - _bc(dns.alpha(t_vec) * phi1, ndim) * m_s
                + _bc((1.0 / r2) * dns.alpha(t_vec) * phi_2, ndim) * (m_s2 - m_s)
            )
        else:
            phi1 = jnp.expm1(h)
            phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi_2 = phi1 / h - 1.0
            x_s2 = (
                _bc(jnp.exp(dns.log_mean_coeff(s2)
                            - dns.log_mean_coeff(s_vec)), ndim) * x
                - _bc(dns.std(s2) * jnp.expm1(r2 * h), ndim) * m_s
                - _bc(r2 / r1 * dns.std(s2) * phi_22, ndim) * (m_s1 - m_s)
            )
            m_s2 = model(x_s2, dns.t_model(s2), dns.alpha(s2), dns.std(s2))
            x_t = (
                _bc(jnp.exp(dns.log_mean_coeff(t_vec)
                            - dns.log_mean_coeff(s_vec)), ndim) * x
                - _bc(dns.std(t_vec) * phi1, ndim) * m_s
                - _bc((1.0 / r2) * dns.std(t_vec) * phi_2, ndim) * (m_s2 - m_s)
            )
        return x_t, (m_s, m_s1)

    if order == 2:
        r1 = 0.5

        def lower(x, s, t):
            return dev_ss(x, s, t, 1, None, None)

        def higher(x, s, t):
            return dev_ss(x, s, t, 2, r1, None)[0]
    else:
        r1, r2 = 1.0 / 3.0, 2.0 / 3.0

        def lower(x, s, t):
            return dev_ss(x, s, t, 2, r1, None)

        def higher(x, s, t):
            return dev_ss(x, s, t, 3, r1, r2)[0]

    t0_vec = jnp.full((b,), t_0, jnp.float32)
    lam_0 = dns.lam(t0_vec)
    s0 = jnp.full((b,), t_T, jnp.float32)

    def cond(carry):
        x, x_prev, s, lam_s, h, nfe = carry
        return jnp.mean(jnp.abs(s - t_0)) > t_err

    def body(carry):
        x, x_prev, s, lam_s, h, nfe = carry
        t = dns.inv_lam(lam_s + h)
        x_lower, _ = lower(x, s, t)
        x_higher = higher(x, s, t)
        x_lower = x_lower.astype(x.dtype)
        x_higher = x_higher.astype(x.dtype)
        delta = jnp.maximum(
            atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev))
        )
        err = ((x_higher - x_lower) / delta).reshape(b, -1)
        E = jnp.sqrt(jnp.mean(err ** 2, axis=-1)).max()
        accept = E <= 1.0
        x = jnp.where(accept, x_higher, x)
        s = jnp.where(accept, t, s)
        x_prev = jnp.where(accept, x_lower, x_prev)
        lam_s = jnp.where(accept, dns.lam(s), lam_s)
        h = jnp.minimum(theta * h * E ** (-1.0 / order), lam_0 - lam_s)
        return (x, x_prev, s, lam_s, h, nfe + order)

    h0 = jnp.full((b,), h_init, jnp.float32)
    carry = (x_T, x_T, s0, dns.lam(s0), h0, jnp.int32(0))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return x


# --------------------------------------------------------------------------
# PLMS
# --------------------------------------------------------------------------

def plms_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    steps: int = 25,
) -> jnp.ndarray:
    """Pseudo linear multistep sampler (plms.py:58-236), η=0.

    ε-history Adams-Bashforth combination of orders 1–4; the first step uses
    the 2-NFE midpoint bootstrap of the reference (plms.py:214-221).
    """
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps("uniform", steps, schedule.num_timesteps)
    steps = len(ts)
    _, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, 0.0)
    sqrt_one_minus = np.sqrt(1.0 - alphas)

    order = slice(None, None, -1)
    t_r = jnp.asarray(ts[order].copy(), jnp.float32)
    t_next_r = jnp.asarray(
        np.concatenate([ts[order][1:], [ts[0] - (ts[1] - ts[0])]]).clip(min=0),
        jnp.float32,
    )
    a_r = jnp.asarray(alphas[order], jnp.float32)
    ap_r = jnp.asarray(alphas_prev[order], jnp.float32)
    s1_r = jnp.asarray(sqrt_one_minus[order], jnp.float32)

    b = x_T.shape[0]

    def x_prev_from(x, e, i):
        pred_x0 = (x - s1_r[i] * e) / jnp.sqrt(a_r[i])
        dir_xt = jnp.sqrt(1.0 - ap_r[i]) * e
        return (jnp.sqrt(ap_r[i]) * pred_x0 + dir_xt).astype(x.dtype)

    def eval_eps(x, scale, tvals):
        t_vec = jnp.full((b,), tvals, x.dtype)
        return eps_fn(x, t_vec, scale)

    # first step: midpoint bootstrap (2 NFE). The second call evaluates the
    # model at t_next, so the classifier-grad scale is √(1−ᾱ) at t_next
    # (= alphas_prev[0]), matching the reference's modify_score indexing at
    # the timestep actually passed.
    e0 = eval_eps(x_T, s1_r[0], t_r[0])
    x1 = x_prev_from(x_T, e0, 0)
    e0_next = eval_eps(x1, jnp.sqrt(1.0 - ap_r[0]), t_next_r[0])
    e_prime = 0.5 * (e0 + e0_next)
    x = x_prev_from(x_T, e_prime, 0)

    hist = jnp.stack([e0, e0, e0])  # [-1, -2, -3], most recent first

    def step(carry, i):
        x, hist, count = carry
        e_t = eval_eps(x, s1_r[i], t_r[i])
        branches = [
            lambda: (3.0 * e_t - hist[0]) / 2.0,
            lambda: (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0,
            lambda: (
                55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]
            ) / 24.0,
        ]
        e_prime = jax.lax.switch(jnp.minimum(count, 2), branches)
        x_new = x_prev_from(x, e_prime, i)
        hist_new = jnp.stack([e_t, hist[0], hist[1]])
        return (x_new, hist_new, count + 1), None

    (x, _, _), _ = jax.lax.scan(step, (x, hist, 0), jnp.arange(1, steps))
    return x
