"""The invertible wav ↔ normalised-mel transform chain.

Behavioural spec: reference ``TRANSFORMS`` (`data_preprocess/wav2spec.py:145-155`)
    MelSpectrogram(16000, 1024, 125, 7600, 128, 256, power=1)
    → max(1e-5, ·) → log10 → ×20 → −20 → +100 → ÷100 → clip(0, 1)
and its inverse (`adm/logger.py:1210-1226`, the corrected 16 kHz variant of
`inference/demo_util.py:196-211`): ×100 −100 +20 ÷20 → 10^x → NNLS mel→STFT →
Griffin-Lim.

Everything is batched jax; the whole inversion runs on-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.griffin_lim import griffin_lim, mel_to_stft
from ..ops.mel import mel_filterbank
from ..ops.stft import stft_magnitude


@dataclasses.dataclass(frozen=True)
class MelSpec:
    """Static mel-pipeline hyperparameters (reference wav2spec.py:142-146)."""

    sr: int = 16000
    n_fft: int = 1024
    fmin: float = 125.0
    fmax: float = 7600.0
    n_mels: int = 128
    hop_length: int = 256
    spec_power: float = 1.0


DEFAULT_MELSPEC = MelSpec()


def normalize_spectrogram(mel: jnp.ndarray) -> jnp.ndarray:
    """Raw mel magnitude → [0, 1] (LowerThresh/Log10/affine/Clip chain)."""
    x = jnp.log10(jnp.maximum(1e-5, mel))
    x = (x * 20.0 - 20.0 + 100.0) / 100.0
    return jnp.clip(x, 0.0, 1.0)


def denormalize_spectrogram(spec: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] normalised spec → raw mel magnitude (inverse affine + 10^x)."""
    x = (spec * 100.0 - 100.0 + 20.0) / 20.0
    return jnp.power(10.0, x)


@partial(jax.jit, static_argnames=("cfg",))
def wav_to_mel(wav: jnp.ndarray, cfg: MelSpec = DEFAULT_MELSPEC) -> jnp.ndarray:
    """(..., n_samples) waveform → (..., n_mels, n_frames) normalised mel."""
    mag = stft_magnitude(
        wav, n_fft=cfg.n_fft, hop_length=cfg.hop_length, power=cfg.spec_power
    )
    fb = mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, mag.dtype)
    mel = jnp.einsum("mf,...ft->...mt", fb, mag)
    return normalize_spectrogram(mel)


@partial(jax.jit, static_argnames=("cfg", "n_iter", "length"))
def mel_to_wav(
    spec: jnp.ndarray,
    key: jax.Array,
    cfg: MelSpec = DEFAULT_MELSPEC,
    n_iter: int = 32,
    length: int | None = None,
) -> jnp.ndarray:
    """Normalised (..., n_mels, n_frames) spec → (..., n_samples) waveform."""
    mel = denormalize_spectrogram(spec)
    mag = mel_to_stft(
        mel, sr=cfg.sr, n_fft=cfg.n_fft, fmin=cfg.fmin, fmax=cfg.fmax,
        power=cfg.spec_power,
    )
    return griffin_lim(
        mag, key, n_fft=cfg.n_fft, hop_length=cfg.hop_length, n_iter=n_iter,
        length=length,
    )
