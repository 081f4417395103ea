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

from typing import Callable, NamedTuple, Optional

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
) -> jnp.ndarray:
    """DDIM sampling loop (ddim.py:232-316 / 345-396).

    Classifier-grad scale per step is √(1−ᾱ_t) (ddim.py:368,380).
    discr_method: 'uniform' or 'quad' timestep spacing (util.py:46-53).
    """
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = make_ddim_timesteps(discr_method, steps, schedule.num_timesteps)
    steps = len(ts)  # uniform stride may over-produce (util.py:48-49 semantics)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta)
    sqrt_one_minus = np.sqrt(1.0 - alphas)

    # iterate reversed (T→0)
    order = slice(None, None, -1)
    tbl = dict(
        t=jnp.asarray(ts[order], jnp.float32),
        a=jnp.asarray(alphas[order], jnp.float32),
        a_prev=jnp.asarray(alphas_prev[order], jnp.float32),
        sigma=jnp.asarray(sigmas[order], jnp.float32),
        s1ma=jnp.asarray(sqrt_one_minus[order], jnp.float32),
    )
    keys = jax.random.split(key, steps)

    def step(x, per_step):
        c, k = per_step
        b = x.shape[0]
        t_vec = jnp.full((b,), c["t"], x.dtype)
        e_t = eps_fn(x, t_vec, c["s1ma"])
        pred_x0 = (x - c["s1ma"] * e_t) / jnp.sqrt(c["a"])
        dir_xt = jnp.sqrt(1.0 - c["a_prev"] - c["sigma"] ** 2) * e_t
        noise = c["sigma"] * jax.random.normal(k, x.shape, x.dtype) * temperature
        # cast back: the fp32 table scalars would otherwise promote a bf16
        # carry and break the scan's carry-dtype invariance
        x_new = jnp.sqrt(c["a_prev"]) * pred_x0 + dir_xt + noise
        return x_new.astype(x.dtype), None

    x, _ = jax.lax.scan(step, x_T, (tbl, keys))
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
# DPM-Solver++(2M)  — the shipped inference operating point
# --------------------------------------------------------------------------

class _DPMTables(NamedTuple):
    t_model: jnp.ndarray      # (steps+1,) model-input times (t_cont - 1/N)*1000
    alpha: jnp.ndarray        # (steps+1,)
    sigma: jnp.ndarray        # (steps+1,)
    lam: jnp.ndarray          # (steps+1,)
    s_t: jnp.ndarray          # (steps+1,) classifier scale = sigma_t


def _dpm_tables(schedule: DiffusionSchedule, steps: int) -> _DPMTables:
    """Precompute the NoiseScheduleVP('discrete') marginals on the
    time_uniform grid (dpm_solver.py:95-160), float64 host-side."""
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    N = len(ac)
    log_alpha_arr = 0.5 * np.log(ac)  # at t = (i+1)/N
    t_arr = np.linspace(0.0, 1.0, N + 1)[1:]

    t_T, t_0 = 1.0, 1.0 / N
    t_grid = np.linspace(t_T, t_0, steps + 1)

    log_alpha = np.interp(t_grid, t_arr, log_alpha_arr)  # piecewise-linear
    alpha = np.exp(log_alpha)
    sigma = np.sqrt(1.0 - np.exp(2.0 * log_alpha))
    lam = log_alpha - np.log(sigma)
    t_model = (t_grid - 1.0 / N) * 1000.0  # get_model_input_time (discrete)

    f = lambda a: jnp.asarray(a, jnp.float32)
    return _DPMTables(f(t_model), f(alpha), f(sigma), f(lam), f(sigma))


def dpm_solver_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    steps: int = 25,
) -> jnp.ndarray:
    """Multistep DPM-Solver++ order 2 (predict_x0, 'dpm_solver' type).

    Mirrors DPM_Solver.sample(method='multistep', order=2, time_uniform,
    lower_order_final) at dpm_solver.py:1077-1106 with the data-prediction
    updates at dpm_solver.py:785-796 (second order) and the first-order
    DPM-Solver++ step.  `steps` NFE total (no eval at the final time).
    """
    assert steps >= 2
    tb = _dpm_tables(schedule, steps)
    b = x_T.shape[0]

    def model_x0(x, i):
        """ε-model → data prediction at grid index i (model_wrapper +
        data_prediction_fn, thresholding=False)."""
        t_vec = jnp.full((b,), tb.t_model[i], x.dtype)
        eps = eps_fn(x, t_vec, tb.s_t[i])
        return (x - tb.sigma[i] * eps) / tb.alpha[i]

    # ---- init: first-order update t_0 → t_1 ----
    # carries are kept in x_T's dtype (bf16 in, bf16 through the scan)
    m0 = model_x0(x_T, 0).astype(x_T.dtype)
    h1 = tb.lam[1] - tb.lam[0]
    x = (
        (tb.sigma[1] / tb.sigma[0]) * x_T
        - tb.alpha[1] * jnp.expm1(-h1) * m0
    ).astype(x_T.dtype)

    # ---- scan: second-order multistep updates t_i → t_{i+1}, i = 1..steps-1.
    # lower_order_final (dpm_solver.py:1094): for steps < 15 the final update
    # drops to first order (the D1_0 correction is zeroed).
    idx = jnp.arange(1, steps)
    order2 = np.ones(steps - 1, np.float32)
    if steps < 15:
        order2[-1] = 0.0
    order2 = jnp.asarray(order2)

    def step(carry, per):
        i, o2 = per
        x, m_prev1 = carry
        m_prev0 = model_x0(x, i)
        lam_p1, lam_p0, lam_t = tb.lam[i - 1], tb.lam[i], tb.lam[i + 1]
        h = lam_t - lam_p0
        h0 = lam_p0 - lam_p1
        r0 = h0 / h
        D1_0 = (m_prev0 - m_prev1) / r0
        phi = jnp.expm1(-h)
        x_new = (
            (tb.sigma[i + 1] / tb.sigma[i]) * x
            - tb.alpha[i + 1] * phi * m_prev0
            - o2 * 0.5 * tb.alpha[i + 1] * phi * D1_0
        )
        return (x_new.astype(x.dtype), m_prev0.astype(m_prev1.dtype)), None

    (x, _), _ = jax.lax.scan(step, (x, m0), (idx, order2))
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
