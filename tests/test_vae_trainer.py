"""VAE trainer: G/D alternating step, adaptive weight, GAN gating."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.train.vae import VAETrainConfig, VAETrainer
from diff_foley_tpu.train.vae_losses import (
    VAELossConfig,
    hinge_d_loss,
    mel_spectrogram_loss,
    vanilla_d_loss,
    feature_match_loss,
)


def test_gan_losses_basic():
    real = jnp.asarray([2.0, 3.0])
    fake = jnp.asarray([-2.0, -3.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(-real, -fake)) > 1.0
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))
    fm = feature_match_loss([jnp.ones((2, 4))], [jnp.zeros((2, 4))])
    assert float(fm) == 1.0


def test_mel_spectrogram_loss_zero_for_identical():
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4096)), jnp.float32)
    assert float(mel_spectrogram_loss(wav, wav)) < 1e-6
    other = wav * 0.5
    assert float(mel_spectrogram_loss(other, wav)) > 0.01


def test_vae_train_step_runs_and_reconstruction_improves():
    trainer = VAETrainer(
        AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)),
        VAETrainConfig(lr=1e-4, loss=VAELossConfig(disc_start=2)),
    )
    state = trainer.init_train_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
    step = jax.jit(trainer.make_train_step())
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    nlls = []
    for i in range(6):
        state, m = step(state, x, jax.random.PRNGKey(2))
        nlls.append(float(m["nll_loss"]))
        assert np.isfinite(list(m.values())).all(), m
    assert nlls[-1] < nlls[0]
    # GAN engaged after disc_start: d_weight finite, disc loss finite
    assert float(m["d_weight"]) >= 0
    assert int(state.step) == 6
