"""DSP parity tests: STFT vs scipy, mel filterbank vs slaney formula,
NNLS inversion and Griffin-Lim roundtrip quality (SURVEY.md §4/§7.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from diff_foley_tpu.audio.transforms import (
    DEFAULT_MELSPEC,
    denormalize_spectrogram,
    mel_to_wav,
    normalize_spectrogram,
    wav_to_mel,
)
from diff_foley_tpu.ops.griffin_lim import mel_to_stft
from diff_foley_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz
from diff_foley_tpu.ops.stft import hann_window, istft, stft


def _chirp(n=16000, sr=16000):
    t = np.arange(n) / sr
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1870 * t * (1 + 0.3 * t))
    ).astype(np.float32)


def test_hann_window_periodic():
    w = np.asarray(hann_window(1024))
    ref = scipy.signal.get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(w, ref, atol=1e-6)


def test_stft_matches_scipy():
    x = _chirp()
    S = np.asarray(stft(jnp.asarray(x), n_fft=1024, hop_length=256))
    # scipy with matching conventions: centered, reflect-padded, hann, no
    # scaling. Emulate by explicit padding + framing.
    xp = np.pad(x, 512, mode="reflect")
    n_frames = 1 + (len(xp) - 1024) // 256
    win = scipy.signal.get_window("hann", 1024, fftbins=True)
    ref = np.stack(
        [
            np.fft.rfft(xp[i * 256 : i * 256 + 1024] * win)
            for i in range(n_frames)
        ],
        axis=1,
    )
    assert S.shape == ref.shape == (513, n_frames)
    np.testing.assert_allclose(S, ref, atol=2e-2, rtol=1e-4)


def test_istft_roundtrip():
    x = _chirp()
    S = stft(jnp.asarray(x), n_fft=1024, hop_length=256)
    y = np.asarray(istft(S, n_fft=1024, hop_length=256, length=len(x)))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_batched():
    x = np.stack([_chirp(), _chirp()[::-1].copy()])
    S = stft(jnp.asarray(x))
    y = np.asarray(istft(S, length=x.shape[-1]))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_mel_scale_slaney_formula():
    # linear region
    np.testing.assert_allclose(hz_to_mel(200.0), 3.0, rtol=1e-12)
    np.testing.assert_allclose(mel_to_hz(3.0), 200.0, rtol=1e-12)
    # log region: 6400 Hz is exactly 27 mel steps above 1 kHz
    np.testing.assert_allclose(hz_to_mel(6400.0), 15.0 + 27.0, rtol=1e-12)
    np.testing.assert_allclose(mel_to_hz(42.0), 6400.0, rtol=1e-12)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(16000, 1024, 128, 125.0, 7600.0))
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    # each filter is a normalised triangle: nonzero support, unimodal
    support = (fb > 0).sum(axis=1)
    assert np.all(support >= 1)
    # slaney equal-area: integral over Hz approx 2/(width)*area = 1
    freqs = np.linspace(0, 8000, 513)
    areas = np.trapezoid(fb, freqs, axis=1)
    np.testing.assert_allclose(areas, 1.0, rtol=0.15)


def test_normalize_denormalize_roundtrip():
    mel = np.abs(np.random.default_rng(0).normal(size=(128, 64))).astype(np.float32)
    mel = np.clip(mel, 1e-5, 10.0)
    spec = normalize_spectrogram(jnp.asarray(mel))
    back = np.asarray(denormalize_spectrogram(spec))
    inside = (mel > 1e-4) & (mel < 10.0 ** ((1 * 100 - 100 + 20) / 20))
    np.testing.assert_allclose(back[inside], mel[inside], rtol=1e-3)


def test_wav_to_mel_shape_and_range():
    x = _chirp(16000 * 2 - 1)
    spec = np.asarray(wav_to_mel(jnp.asarray(x)))
    assert spec.shape[0] == 128
    assert spec.min() >= 0.0 and spec.max() <= 1.0
    # hop 256, centered: n_frames = 1 + n//hop
    assert spec.shape[1] == 1 + (16000 * 2 - 1) // 256


def test_mel_to_stft_nnls_quality():
    x = _chirp()
    mag = jnp.abs(stft(jnp.asarray(x)))
    fb = mel_filterbank()
    mel = jnp.einsum("mf,ft->mt", fb, mag)
    rec = mel_to_stft(mel)
    # NNLS residual in mel domain should be small
    mel_rec = jnp.einsum("mf,ft->mt", fb, rec)
    err = float(jnp.linalg.norm(mel_rec - mel) / jnp.linalg.norm(mel))
    assert err < 0.02, err


def test_griffin_lim_roundtrip_spectral_convergence():
    x = _chirp(16000)
    spec = wav_to_mel(jnp.asarray(x))
    y = mel_to_wav(spec, jax.random.PRNGKey(0), n_iter=32, length=len(x))
    assert y.shape == (len(x),)
    # compare linear-magnitude mel spectrograms of original vs reconstruction
    a = denormalize_spectrogram(spec)
    b = denormalize_spectrogram(wav_to_mel(y))
    sc = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert sc < 0.12, sc


def test_mel_to_wav_batched():
    x = np.stack([_chirp(8192), 0.5 * _chirp(8192)])
    spec = wav_to_mel(jnp.asarray(x))
    y = mel_to_wav(spec, jax.random.PRNGKey(1), length=8192)
    assert y.shape == (2, 8192)


def test_rdft_matmul_backend_matches_fft():
    """The MXU-matmul rDFT backend (Griffin-Lim's default) against XLA's
    FFT, both directions, plus the public backend switch."""
    import importlib
    import sys

    importlib.import_module("diff_foley_tpu.ops.stft")
    stft_mod = sys.modules["diff_foley_tpu.ops.stft"]

    x = _chirp(16384)
    s_fft = stft(jnp.asarray(x), rdft="fft")
    s_mm = stft(jnp.asarray(x), rdft="matmul")
    np.testing.assert_allclose(
        np.abs(np.asarray(s_mm)), np.abs(np.asarray(s_fft)),
        atol=2e-3, rtol=1e-3,
    )
    y = np.asarray(istft(s_mm, length=len(x), rdft="matmul"))
    np.testing.assert_allclose(y, x, atol=2e-4)

    stft_mod.set_stft_backend("matmul")
    try:
        s_glob = stft(jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(s_glob), np.asarray(s_mm))
    finally:
        stft_mod.set_stft_backend("fft")


def test_griffin_lim_rdft_backends_agree():
    """GL quality is backend-independent (same SC to within tolerance)."""
    from diff_foley_tpu.ops.griffin_lim import griffin_lim

    x = _chirp(16000)
    mag = jnp.abs(stft(jnp.asarray(x)))
    scs = []
    for rdft in ("fft", "matmul"):
        y = griffin_lim(mag, jax.random.PRNGKey(0), n_iter=8, length=len(x),
                        rdft=rdft)
        rec = jnp.abs(stft(y))[..., : mag.shape[-1]]
        scs.append(float(jnp.linalg.norm(rec - mag) / jnp.linalg.norm(mag)))
    assert abs(scs[0] - scs[1]) < 0.02, scs
