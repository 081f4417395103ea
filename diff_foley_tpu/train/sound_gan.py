"""SoundStream-style GAN training for the 1D waveform VAE.

Behavioural spec: reference `adm/modules/losses/audioloss_prior.py:12-139`
(AudioLoss) + `adm/modules/discriminator/model.py:8-110`
(STFTDiscriminator_wrapper): generator loss = time-domain L1 + multi-window
mel L1+L2 + feature-match over multi-scale STFT discriminators + hinge
adversarial + KL; discriminator loss = hinge on the same multi-scale real/
imag STFT inputs. Optimised as the Sound_AutoencoderKL's two-optimizer
Lightning loop (autoencoder.py:51-100).

NB: the reference default wires 5 discriminators to 3 STFT scales (an
IndexError waiting to happen); here one discriminator per scale.

Layout: waveforms (B, L, 1) NLC; STFT features (B, F, T, 2) NHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..models.sound_vae import SoundAutoencoderKL, SoundVAEConfig
from ..ops.mel import mel_filterbank
from ..ops.stft import stft


class STFTDiscriminator(nn.Module):
    """Per-scale conv discriminator over (B, F, T, 2) real/imag STFT
    (discriminator/model.py:27-110). Returns every layer's activations;
    the last entry is the logit map."""

    last_act: bool = True

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        feats = []
        specs = [
            (32, (3, 8), (1, 1), (1, 1)),
            (64, (3, 3), (2, 2), (1, 1)),
            (128, (3, 3), (2, 2), (1, 2)),
            (128, (3, 3), (2, 2), (1, 4)),
        ]
        for i, (ch, k, s, d) in enumerate(specs):
            x = nn.Conv(ch, k, strides=s, kernel_dilation=d, padding="VALID",
                        name=f"conv{i}")(x)
            assert min(x.shape[1:3]) > 0, (
                f"STFT map too small after conv{i} (shape {x.shape}); "
                "use longer audio or fewer/lower-hop STFT scales"
            )
            x = nn.elu(x)
            feats.append(x)
        x = nn.Conv(1, (3, 3), padding="VALID", name="conv_out")(x)
        if self.last_act:
            x = nn.elu(x)
        feats.append(x)
        return feats


@dataclasses.dataclass(frozen=True)
class AudioGANConfig:
    """AudioLoss defaults (audioloss_prior.py:13-47)."""

    time_weight: float = 1.0
    freq_weight: float = 1.0
    feat_weight: float = 1.0
    g_weight: float = 1.0
    d_weight: float = 1.0
    kl_weight: float = 1.0
    disc_start: int = 50001
    mel_windows: Sequence[int] = tuple(range(5, 12))   # win 32..2048
    stft_windows: Sequence[int] = tuple(range(9, 12))  # win 512..2048
    n_fft: int = 2048
    sr: int = 16000
    num_mels: int = 80
    fmin: float = 80.0
    fmax: float = 7600.0
    lr: float = 3e-4


def multi_window_mel_loss(a: jnp.ndarray, b: jnp.ndarray,
                          cfg: AudioGANConfig) -> jnp.ndarray:
    """L1+L2 mel losses averaged over window scales (audioloss_prior:49-64).
    Inputs (B, L) waveforms."""
    l1 = l2 = 0.0
    fb = jnp.asarray(mel_filterbank(
        cfg.sr, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))
    for i in cfg.mel_windows:
        win = 2 ** i
        ma = jnp.abs(stft(a, n_fft=cfg.n_fft, hop_length=2 ** (i - 2),
                          win_length=win, normalized=True))
        mb = jnp.abs(stft(b, n_fft=cfg.n_fft, hop_length=2 ** (i - 2),
                          win_length=win, normalized=True))
        mel_a = jnp.einsum("mf,bft->bmt", fb, ma)
        mel_b = jnp.einsum("mf,bft->bmt", fb, mb)
        l1 = l1 + jnp.mean(jnp.abs(mel_a - mel_b))
        l2 = l2 + jnp.sqrt(jnp.mean((mel_a - mel_b) ** 2) + 1e-12)
    n = len(cfg.mel_windows)
    return l1 / n + l2 / n


def stft_feature_list(wav: jnp.ndarray, cfg: AudioGANConfig):
    """(B, L) → per-scale (B, F, T, 2) real/imag maps (audioloss:67-77)."""
    out = []
    for i in cfg.stft_windows:
        s = stft(wav, n_fft=cfg.n_fft, hop_length=2 ** (i - 2),
                 win_length=2 ** i, normalized=True)
        out.append(jnp.stack([s.real, s.imag], axis=-1))
    return out


class SoundGANState(NamedTuple):
    step: jnp.ndarray
    params: Any          # VAE
    disc_params: Any     # tuple of per-scale discriminator params
    opt_state: Any
    disc_opt_state: Any


class SoundVAETrainer:
    """Two-optimizer waveform VAE-GAN (Sound_AutoencoderKL training loop)."""

    def __init__(self, cfg: AudioGANConfig = AudioGANConfig(),
                 vae_cfg: SoundVAEConfig = SoundVAEConfig()):
        self.cfg = cfg
        self.vae = SoundAutoencoderKL(vae_cfg)
        self.discs = [STFTDiscriminator() for _ in cfg.stft_windows]
        self.tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)

    def init_train_state(self, key: jax.Array, n_samples: int = 4096):
        k0, k1, *dks = jax.random.split(key, 2 + len(self.discs))
        wav = jnp.zeros((1, n_samples, 1))
        params = self.vae.init({"params": k0}, wav, k1)
        feats = stft_feature_list(wav[..., 0], self.cfg)
        disc_params = tuple(
            d.init(k, f)["params"]
            for d, k, f in zip(self.discs, dks, feats)
        )
        return SoundGANState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            disc_params=disc_params,
            opt_state=self.tx.init(params),
            disc_opt_state=self.disc_tx.init(disc_params),
        )

    def _disc_outputs(self, disc_params, wav):
        feats = stft_feature_list(wav, self.cfg)
        return [
            d.apply({"params": p}, f)
            for d, p, f in zip(self.discs, disc_params, feats)
        ]

    def make_train_step(self):
        cfg = self.cfg

        def gen_loss_fn(params, disc_params, wav, key, step):
            rec, posterior = self.vae.apply(params, wav, key)
            time_loss = jnp.mean(jnp.abs(wav - rec))
            freq_loss = multi_window_mel_loss(
                wav[..., 0], rec[..., 0], cfg)
            outs_real = self._disc_outputs(disc_params, wav[..., 0])
            outs_fake = self._disc_outputs(disc_params, rec[..., 0])
            feat_match = sum(
                jnp.mean(jnp.abs(a - b))
                for or_, of_ in zip(outs_real, outs_fake)
                for a, b in zip(or_, of_)
            ) / sum(len(o) for o in outs_real)
            # hinge generator term averaged over scales (discriminator_loss.py)
            g_loss = sum(-jnp.mean(o[-1]) for o in outs_fake) / len(outs_fake)
            kl = jnp.sum(posterior.kl()) / wav.shape[0]
            disc_factor = jnp.where(step >= cfg.disc_start, 1.0, 0.0)
            loss = (cfg.time_weight * time_loss
                    + cfg.freq_weight * freq_loss
                    + cfg.feat_weight * feat_match
                    + disc_factor * cfg.g_weight * g_loss
                    + cfg.kl_weight * kl)
            logs = {"time_domain_loss": time_loss,
                    "freq_domain_loss": freq_loss,
                    "feat_match_loss": feat_match,
                    "g_loss": g_loss, "kl_loss": kl}
            return loss, (logs, rec)

        def disc_loss_fn(disc_params, wav, rec, step):
            outs_real = self._disc_outputs(disc_params, wav[..., 0])
            outs_fake = self._disc_outputs(disc_params, rec[..., 0])
            real = sum(jnp.mean(nn.relu(1.0 - o[-1])) for o in outs_real)
            fake = sum(jnp.mean(nn.relu(1.0 + o[-1])) for o in outs_fake)
            n = len(outs_real)
            disc_factor = jnp.where(step >= cfg.disc_start, 1.0, 0.0)
            return disc_factor * cfg.d_weight * 0.5 * (real + fake) / n

        def step_fn(state: SoundGANState, wav, rng):
            key = jax.random.fold_in(rng, state.step)
            (gl, (logs, rec)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(state.params, state.disc_params, wav, key, state.step)
            updates, opt_state = self.tx.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)

            dl, dgrads = jax.value_and_grad(disc_loss_fn)(
                state.disc_params, wav, jax.lax.stop_gradient(rec),
                state.step,
            )
            dupdates, disc_opt_state = self.disc_tx.update(
                dgrads, state.disc_opt_state)
            disc_params = optax.apply_updates(state.disc_params, dupdates)
            logs = dict(logs)
            logs["total_loss"] = gl
            logs["d_loss"] = dl
            return (
                SoundGANState(state.step + 1, params, disc_params,
                              opt_state, disc_opt_state),
                logs,
            )

        return step_fn
