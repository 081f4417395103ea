"""Schedule math vs independent float64 references (SURVEY.md §4 strategy)."""
import numpy as np
import jax.numpy as jnp

from diff_foley_tpu.diffusion.schedule import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    timestep_embedding,
)

# The shipped LDM operating point (inference/config/Stage2_LDM.yaml:5-9)
LDM = dict(linear_start=0.00085, linear_end=0.0120, timesteps=1000)


def test_linear_betas_float64_bitmatch_torch_recipe():
    betas = make_beta_schedule("linear", 1000, LDM["linear_start"], LDM["linear_end"])
    # independent recomputation of the sqrt-linspace-square recipe
    ref = (
        np.linspace(LDM["linear_start"] ** 0.5, LDM["linear_end"] ** 0.5, 1000,
                    dtype=np.float64) ** 2
    )
    assert betas.dtype == np.float64
    np.testing.assert_array_equal(betas, ref)
    assert betas[0] == LDM["linear_start"]
    assert abs(betas[-1] - LDM["linear_end"]) < 1e-12


def test_cosine_and_sqrt_schedules_shapes():
    for name in ("cosine", "sqrt_linear", "sqrt"):
        b = make_beta_schedule(name, 100)
        assert b.shape == (100,)
        assert np.all(b >= 0) and np.all(b <= 1)


def test_schedule_tables_consistency():
    s = DiffusionSchedule.create(
        timesteps=1000, linear_start=LDM["linear_start"], linear_end=LDM["linear_end"]
    )
    ac = np.asarray(s.alphas_cumprod, dtype=np.float64)
    # float64 ground truth
    betas = make_beta_schedule("linear", 1000, LDM["linear_start"], LDM["linear_end"])
    ac_ref = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(ac, ac_ref, rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - ac_ref), rtol=2e-5
    )
    # posterior mean coefs sum: mu = c1*x0 + c2*xt with c1*sqrt(ac)+... sanity
    assert np.all(np.isfinite(np.asarray(s.lvlb_weights)))
    assert np.asarray(s.lvlb_weights)[0] == np.asarray(s.lvlb_weights)[1]


def test_q_sample_interpolates():
    s = DiffusionSchedule.create(timesteps=1000, **{k: LDM[k] for k in ("linear_start", "linear_end")})
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    xt = s.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0, 0, 0, 0]), np.sqrt(1 - 0.00085), rtol=1e-5
    )
    # at t=999 nearly all signal gone
    assert float(xt[1, 0, 0, 0]) < 0.07


def test_predict_start_roundtrip():
    s = DiffusionSchedule.create(timesteps=1000)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 8, 8, 2)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), dtype=jnp.float32)
    t = jnp.array([10, 500, 900])
    xt = s.q_sample(x0, t, noise)
    x0_rec = s.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-3)
    eps_rec = s.predict_eps_from_start(xt, t, x0_rec)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=2e-2)


def test_ddim_timesteps_uniform_offset():
    ts = make_ddim_timesteps("uniform", 25, 1000)
    assert ts.shape == (25,)
    assert ts[0] == 1 and ts[1] == 41  # +1 offset (util.py:57)
    sig, al, al_prev = make_ddim_sampling_parameters(
        np.cumprod(1 - make_beta_schedule("linear", 1000)), ts, eta=0.0
    )
    assert np.all(sig == 0)
    assert al_prev[0] == np.cumprod(1 - make_beta_schedule("linear", 1000))[0]


def test_timestep_embedding_layout():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 320)
    assert emb.shape == (3, 320)
    # t=0 → cos part all ones, sin part all zeros ([cos | sin] order)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), 0.0, atol=1e-6)
    # matches the closed form for a probe frequency
    half = 160
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    np.testing.assert_allclose(
        np.asarray(emb[2, :half]), np.cos(999.0 * freqs), atol=1e-4
    )
