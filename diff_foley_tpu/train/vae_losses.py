"""First-stage (VAE) training losses: reconstruction + KL + adversarial.

Behavioural spec: reference `adm/modules/losses/decoder_loss.py:31`
(LPIPSWithDiscriminator), `taming/discriminator.py:99` (NLayerDiscriminator),
`discriminator_loss.py:7,58` (hinge/vanilla), `feature_match_loss.py:5`,
`spec_loss.py` (MelSpectrogramLoss on waveforms).

Differences, by necessity and design:
- The LPIPS perceptual term requires pretrained VGG16 weights (vendored as
  `taming/.../vgg.pth` in the reference); this environment has no network
  egress, so the perceptual hook is pluggable (`perceptual_fn`) and defaults
  to off — exactly the `perceptual_weight=0` configuration of the loss.
- The adaptive generator weight ‖∇_last nll‖ / ‖∇_last g‖
  (decoder_loss.py:69-77) is computed with jax.grad against the decoder's
  output-conv kernel, passed in explicitly (no autograd graph walking).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..audio.transforms import MelSpec
from ..ops.mel import mel_filterbank
from ..ops.stft import stft_magnitude


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming/discriminator.py:99), BN variant."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"conv{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"conv{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name=f"bn{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    """discriminator_loss.py:7-14."""
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    """discriminator_loss.py:58 (softplus form)."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def feature_match_loss(feats_real: Sequence, feats_fake: Sequence):
    """L1 between discriminator features (feature_match_loss.py:5)."""
    return sum(
        jnp.mean(jnp.abs(a - b)) for a, b in zip(feats_real, feats_fake)
    ) / max(len(feats_real), 1)


def mel_spectrogram_loss(
    wav_hat: jnp.ndarray, wav: jnp.ndarray,
    cfgs: Sequence[MelSpec] = (MelSpec(),),
    log_eps: float = 1e-5,
):
    """Multi-config mel L1 (+log-L1) on waveforms (spec_loss.py:98-246)."""
    total = 0.0
    for cfg in cfgs:
        fb = mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
        mag_a = stft_magnitude(wav_hat, cfg.n_fft, cfg.hop_length,
                               power=cfg.spec_power)
        mag_b = stft_magnitude(wav, cfg.n_fft, cfg.hop_length,
                               power=cfg.spec_power)
        mel_a = jnp.einsum("mf,...ft->...mt", fb, mag_a)
        mel_b = jnp.einsum("mf,...ft->...mt", fb, mag_b)
        total = total + jnp.mean(jnp.abs(mel_a - mel_b)) + jnp.mean(
            jnp.abs(jnp.log(mel_a + log_eps) - jnp.log(mel_b + log_eps))
        )
    return total / len(cfgs)


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    kl_weight: float = 1e-6              # SD first-stage default
    disc_weight: float = 0.5
    disc_start: int = 50001              # steps before the GAN term engages
    disc_factor: float = 1.0
    logvar_init: float = 0.0
    disc_loss: str = "hinge"
    perceptual_weight: float = 0.0       # LPIPS hook off by default (see doc)


def generator_loss(
    rec: jnp.ndarray,
    x: jnp.ndarray,
    posterior,
    logits_fake: jnp.ndarray,
    step: jnp.ndarray,
    cfg: VAELossConfig,
    adaptive_weight: jnp.ndarray,
    perceptual_fn: Optional[Callable] = None,
):
    """LPIPSWithDiscriminator forward, optimizer_idx=0 (decoder_loss.py:79-116)."""
    rec_loss = jnp.abs(x - rec)
    if perceptual_fn is not None and cfg.perceptual_weight > 0:
        rec_loss = rec_loss + cfg.perceptual_weight * perceptual_fn(x, rec)
    nll = rec_loss / jnp.exp(cfg.logvar_init) + cfg.logvar_init
    nll_loss = jnp.sum(nll) / nll.shape[0]
    kl_loss = jnp.sum(posterior.kl()) / x.shape[0]
    g_loss = -jnp.mean(logits_fake)
    disc_factor = jnp.where(step >= cfg.disc_start, cfg.disc_factor, 0.0)
    loss = nll_loss + cfg.kl_weight * kl_loss + (
        adaptive_weight * disc_factor * g_loss
    )
    return loss, {
        "nll_loss": nll_loss, "kl_loss": kl_loss, "g_loss": g_loss,
        "d_weight": adaptive_weight,
    }


def discriminator_loss(
    logits_real: jnp.ndarray, logits_fake: jnp.ndarray, step: jnp.ndarray,
    cfg: VAELossConfig,
):
    """optimizer_idx=1 branch (decoder_loss.py:118-136)."""
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = jnp.where(step >= cfg.disc_start, cfg.disc_factor, 0.0)
    return disc_factor * fn(logits_real, logits_fake)
