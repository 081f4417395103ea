"""1D waveform VAE (Sound_AutoencoderKL) — SoundStream-style conv/LSTM codec.

Behavioural spec: reference `adm/modules/stage1_model/model.py:60-260` +
`adm/models/autoencoder.py:14` (Sound_AutoencoderKL):

- Encoder: Conv1d(1→C, k=1) + ELU; 4 ConvDownBlocks (ResidualUnit of two 1×1
  convs + ELU + strided DownBlock with K=2S, pad (K−S)/2 + ELU) each followed
  by another ELU, channels doubling, strides (2,2,2,4); 2-layer LSTM; ELU →
  1×1 conv to 2·z (Diagonal Gaussian) [→ ELU unless remove_act].
- Decoder (symmetric): 1×1 conv z→C·2⁴ + ELU; 2-layer LSTM; ELU; 4
  ConvUpBlocks (ResidualUnit + ELU + ConvTranspose1d K=2S pad (K−S)/2 + ELU)
  each + ELU, channels halving, strides applied reversed; 1×1 conv → 1.

The default `remove_act=False` applies an ELU to the Gaussian parameters —
a reference quirk kept for parity.

Layout: NLC (B, L, C); waveform in/out (B, L, 1).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vae import DiagonalGaussian


def _conv1(features, name):
    return nn.Conv(features, (1,), name=name)


class ResidualUnit1D(nn.Module):
    """Two 1×1 convs with ELU between, residual (model.py:81-95)."""

    @nn.compact
    def __call__(self, x):
        h = _conv1(x.shape[-1], "conv1")(x)
        h = nn.elu(h)
        h = _conv1(x.shape[-1], "conv2")(h)
        return x + h


class LSTMStack(nn.Module):
    """n-layer batch-first LSTM (torch nn.LSTM equivalent)."""

    hidden: int
    layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.RNN(
                nn.OptimizedLSTMCell(features=self.hidden), name=f"layer{i}"
            )(x)
        return x


@dataclasses.dataclass(frozen=True)
class SoundVAEConfig:
    channels: int = 32
    z_channels: int = 128
    enc_out_channels: int = 256  # 2·z (mean ‖ logvar)
    strides: Sequence[int] = (2, 2, 2, 4)
    lstm_layers: int = 2
    remove_act: bool = False


class SoundEncoder(nn.Module):
    cfg: SoundVAEConfig = SoundVAEConfig()

    @nn.compact
    def __call__(self, x):
        """(B, L, 1) waveform → (B, L/32, 2·z) Gaussian parameters."""
        cfg = self.cfg
        h = nn.elu(_conv1(cfg.channels, "stem")(x))
        for i, s in enumerate(cfg.strides):
            out_ch = cfg.channels * 2 ** (i + 1)
            h = ResidualUnit1D(name=f"block{i}_res")(h)
            h = nn.elu(h)
            k = 2 * s
            h = nn.Conv(out_ch, (k,), strides=(s,),
                        padding=(k - s) // 2, name=f"block{i}_down")(h)
            h = nn.elu(h)
            h = nn.elu(h)  # Encoder appends ELU after each block (:160)
        h = LSTMStack(h.shape[-1], cfg.lstm_layers, name="lstm")(h)
        h = nn.elu(h)
        h = _conv1(cfg.enc_out_channels, "last_conv")(h)
        return h if cfg.remove_act else nn.elu(h)


class SoundDecoder(nn.Module):
    cfg: SoundVAEConfig = SoundVAEConfig()

    @nn.compact
    def __call__(self, z):
        """(B, L', z) latent → (B, L'·32, 1) waveform."""
        cfg = self.cfg
        top = cfg.channels * 2 ** len(cfg.strides)
        h = nn.elu(_conv1(top, "stem")(z))
        h = LSTMStack(top, cfg.lstm_layers, name="lstm")(h)
        h = nn.elu(h)
        for j, i in enumerate(reversed(range(len(cfg.strides)))):
            out_ch = cfg.channels * 2 ** i
            # torch indexes the REVERSED stride list by i (model.py:196-218):
            # dec_stride_list[i] == enc strides applied smallest-first
            s = cfg.strides[len(cfg.strides) - 1 - i]
            k = 2 * s
            h = ResidualUnit1D(name=f"block{j}_res")(h)
            h = nn.elu(h)
            # torch ConvTranspose1d(padding=p) == full (VALID) transposed
            # conv cropped by p on each side
            p = (k - s) // 2
            h = nn.ConvTranspose(
                out_ch, (k,), strides=(s,), padding="VALID",
                transpose_kernel=True, name=f"block{j}_up",
            )(h)
            if p:
                h = h[:, p:-p, :]
            h = nn.elu(h)
            h = nn.elu(h)  # Decoder appends ELU after each block (:225)
        return _conv1(1, "last_conv")(h)


class SoundAutoencoderKL(nn.Module):
    """encode → DiagonalGaussian over (B, L', z); decode → waveform."""

    cfg: SoundVAEConfig = SoundVAEConfig()

    def setup(self):
        self.encoder = SoundEncoder(self.cfg)
        self.decoder = SoundDecoder(self.cfg)

    def encode(self, x) -> DiagonalGaussian:
        return DiagonalGaussian(self.encoder(x))

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, key=None, sample_posterior: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
