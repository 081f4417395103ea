"""Waveform VAE-GAN training (Sound_AutoencoderKL + AudioLoss,
audioloss_prior.py:12-139): smoke-train with all loss terms live."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.models.sound_vae import SoundVAEConfig
from diff_foley_tpu.train.sound_gan import (
    AudioGANConfig,
    SoundVAETrainer,
    multi_window_mel_loss,
    stft_feature_list,
)

TINY = AudioGANConfig(
    mel_windows=(5, 7), stft_windows=(7, 8), n_fft=256, disc_start=0,
    lr=1e-3,
)


def test_mel_loss_zero_for_identical():
    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 2048)), jnp.float32)
    assert float(multi_window_mel_loss(wav, wav, TINY)) < 1e-6
    other = wav + 0.1
    assert float(multi_window_mel_loss(wav, other, TINY)) > 0


def test_stft_feature_shapes():
    wav = jnp.zeros((2, 2048))
    feats = stft_feature_list(wav, TINY)
    assert len(feats) == 2
    for f in feats:
        assert f.shape[0] == 2 and f.shape[-1] == 2  # (B, F, T, 2)


def test_sound_gan_smoke_train():
    trainer = SoundVAETrainer(TINY, SoundVAEConfig(channels=8,
                                                   z_channels=16,
                                                   enc_out_channels=32))
    state = trainer.init_train_state(jax.random.PRNGKey(0), n_samples=8192)
    step = jax.jit(trainer.make_train_step())
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 8192, 1)) * 0.1, jnp.float32)
    logs = None
    for i in range(3):
        state, logs = step(state, wav, jax.random.PRNGKey(i))
    assert int(state.step) == 3
    for k in ("total_loss", "time_domain_loss", "freq_domain_loss",
              "feat_match_loss", "g_loss", "kl_loss", "d_loss"):
        assert np.isfinite(float(logs[k])), k
    # all terms genuinely contribute
    assert float(logs["feat_match_loss"]) > 0
    assert float(logs["freq_domain_loss"]) > 0


def test_sound_vae_cli_smoke(tmp_path):
    """CLI driver runs end-to-end on synthetic wavs (2 steps)."""
    from scipy.io import wavfile

    from diff_foley_tpu.cli.train_sound_vae import main

    rng = np.random.default_rng(0)
    for i in range(2):
        wav = (rng.normal(size=70000) * 3000).astype(np.int16)
        wavfile.write(str(tmp_path / f"a{i}.wav"), 16000, wav)
    main([
        "--wav-dir", str(tmp_path), "--window", "65536",
        "--batch-size", "1", "--steps", "2", "--disc-start", "0",
        "--channels", "4", "--z-channels", "8",
        "--logdir", str(tmp_path / "logs"), "--log-every", "1",
        "--save-every", "2",
    ])
    assert (tmp_path / "logs" / "results.jsonl").exists()
    # the logdir is a native checkpoint: restore and run the trained VAE
    from diff_foley_tpu.utils.checkpoint import load_native_sound_vae

    vae, variables = load_native_sound_vae(str(tmp_path / "logs"))
    wav_in = jnp.asarray(rng.normal(size=(1, 65536, 1)), jnp.float32)
    rec, _ = vae.apply(variables, wav_in, jax.random.PRNGKey(0))
    assert rec.shape == wav_in.shape
    assert np.isfinite(np.asarray(rec)).all()
