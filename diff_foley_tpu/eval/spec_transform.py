"""Mel-format interop: 128-mel/16 kHz ↔ 80-mel/22.05 kHz spectrograms.

Behavioural spec: reference `evaluation/transform_spec.py:42-61` — converts
generated specs into the SpecVQGAN metric toolchain's format (IS/FID/KL,
`evaluation/readme.md:5-11`): denormalise → resample the linear mel rows by
the sample-rate ratio → pseudo-inverse of the source mel basis → target mel
basis → renormalise.

Note: the source/target mel bases here use librosa *defaults* (fmin 0,
fmax sr/2, slaney) exactly as the reference does — NOT the 125–7600 Hz
training basis. The reference resamples with resampy kaiser_best; this
implementation uses scipy polyphase resampling (spectrally equivalent for
this metric path).
"""
from __future__ import annotations

import numpy as np

from ..ops.mel import _mel_filterbank_np


def _denorm(spec: np.ndarray) -> np.ndarray:
    return 10.0 ** (((spec * 100.0 - 100.0) + 20.0) / 20.0)


def _norm(spec: np.ndarray) -> np.ndarray:
    x = np.log10(np.maximum(1e-5, spec))
    return np.clip((x * 20.0 - 20.0 + 100.0) / 100.0, 0.0, 1.0)


def _transform(
    spec: np.ndarray, origin_n_mels: int, origin_sr: int,
    new_n_mels: int, new_sr: int, n_fft: int = 1024,
) -> np.ndarray:
    import scipy.signal  # lazy: scipy is a test/eval extra, not a base dep

    linear = _denorm(spec)
    g = np.gcd(new_sr, origin_sr)
    linear = scipy.signal.resample_poly(
        linear, new_sr // g, origin_sr // g, axis=-1
    )
    basis_src = _mel_filterbank_np(origin_sr, n_fft, origin_n_mels, 0.0, origin_sr / 2)
    basis_dst = _mel_filterbank_np(new_sr, n_fft, new_n_mels, 0.0, new_sr / 2)
    # no non-negativity clamp: the reference applies pinv directly (:52-55)
    stft_est = np.linalg.pinv(basis_src) @ linear
    return _norm(basis_dst @ stft_est)


def spec_16k128_to_22k80(spec: np.ndarray) -> np.ndarray:
    """Generated-spec → SpecVQGAN evaluation format (transform_spec.py:66-75)."""
    return _transform(spec, 128, 16000, 80, 22050)


def spec_22k80_to_16k128(spec: np.ndarray) -> np.ndarray:
    return _transform(spec, 80, 22050, 128, 16000)
