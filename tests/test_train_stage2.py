"""Stage-2 LDM trainer: loss decreases, EMA tracks, mesh-sharded step runs."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=8,
)


def _batch(key, b=4):
    k1, k2 = jax.random.split(key)
    return {
        "spec": jax.random.uniform(k1, (b, 32, 64, 3)),
        "video_feat": jax.random.normal(k2, (b, 8, 512)),
    }


def test_train_step_loss_decreases():
    ldm = LatentDiffusion(TINY)
    cfg = Stage2TrainConfig(base_lr=2e-4, warmup_steps=1, use_ema=True)
    state = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(ldm, cfg))
    batch = _batch(jax.random.PRNGKey(2))
    losses = []
    for i in range(8):
        state, m = step(state, vae_params, batch, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # EMA should differ from params but stay close
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.ema.params, state.params)
    mx = max(jax.tree.leaves(d))
    assert 0 < mx < 1.0


def test_train_step_data_parallel_mesh(eight_devices):
    ldm = LatentDiffusion(TINY)
    cfg = Stage2TrainConfig(warmup_steps=1)
    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    state = jax.device_put(init_train_state(ldm, jax.random.PRNGKey(0), cfg), repl)
    vae_params = jax.device_put(ldm.init_vae_params(jax.random.PRNGKey(1)), repl)
    batch = jax.device_put(_batch(jax.random.PRNGKey(2), b=16), dsh)
    rng = jax.device_put(jax.random.PRNGKey(3), repl)

    step = jax.jit(
        make_train_step(ldm, cfg),
        in_shardings=(repl, repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    with mesh:
        state2, m = step(state, vae_params, batch, rng)
    assert np.isfinite(float(m["loss"]))

    # gradient-sync parity: the sharded step must equal a single-device step
    state_1dev = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    step_1 = jax.jit(make_train_step(ldm, cfg))
    state2_1dev, m1 = step_1(state_1dev, ldm.init_vae_params(jax.random.PRNGKey(1)),
                             _batch(jax.random.PRNGKey(2), b=16),
                             jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]), rtol=1e-4)
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state2.params, state2_1dev.params
    )
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_ema_steps_once_per_optimizer_update_under_accum():
    """Round-2 review: with accum_steps=K, EMA must advance once per real
    optimizer update, not once per micro-step (decay would become d^K and
    the warmup counter would run K x fast)."""
    ldm = LatentDiffusion(TINY)
    tcfg = Stage2TrainConfig(accum_steps=3, use_ema=True)
    state = init_train_state(ldm, jax.random.PRNGKey(0), tcfg)
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(ldm, tcfg))
    batch = _batch(jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(3)

    for i in range(1, 7):
        state, _ = step(state, vae_params, batch, rng)
        # one EMA update per completed K-step cycle
        assert int(state.ema.num_updates) == i // 3, (i, int(state.ema.num_updates))


def test_train_step_mixed_precision_bf16_compute():
    """compute_dtype="bfloat16": fp32 master params with bf16 forward+backward.

    The TPU-native replacement for the reference's AMP fp16 + GradScaler
    (main.py precision=16, SURVEY.md §2.8) — bf16 needs no loss scaling.
    Checks: masters stay fp32, loss still decreases, and the step-0 loss
    agrees with the fp32 trainer to bf16 tolerance.
    """
    ldm = LatentDiffusion(TINY)
    cfg32 = Stage2TrainConfig(base_lr=2e-4, warmup_steps=1)
    cfg16 = Stage2TrainConfig(base_lr=2e-4, warmup_steps=1,
                              compute_dtype="bfloat16")
    state = init_train_state(ldm, jax.random.PRNGKey(0), cfg16)
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    batch = _batch(jax.random.PRNGKey(2))

    step16 = jax.jit(make_train_step(ldm, cfg16))
    step32 = jax.jit(make_train_step(ldm, cfg32))
    _, m16 = step16(state, vae_params, batch, jax.random.PRNGKey(3))
    _, m32 = step32(state, vae_params, batch, jax.random.PRNGKey(3))
    # same ε-targets, bf16 rounding only: losses agree loosely
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=0.05)

    losses = []
    for i in range(8):
        state, m = step16(state, vae_params, batch, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # master params and optimizer state never leave fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params)
               if jnp.issubdtype(l.dtype, jnp.floating))
