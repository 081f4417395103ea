"""Batched STFT / ISTFT on device.

Matches librosa 0.8.0 semantics used by the reference mel pipeline
(`data_preprocess/wav2spec.py:37`): centered frames, reflect padding, periodic
Hann window, win_length = n_fft.

Framing is a gather with a precomputed (frames, win) index matrix; overlap-add
in :func:`istft` exploits hop | n_fft to decompose each frame into
``n_fft // hop`` aligned blocks, so reconstruction is a few shifted adds
instead of a scatter (TPU-friendly).

The forward/inverse real DFT itself has two backends:

- ``"fft"`` — ``jnp.fft.rfft/irfft`` (XLA's FFT).
- ``"matmul"`` — the rDFT as two real matmuls against precomputed
  cos/sin matrices (and the hermitian-completion synthesis matrices for
  the inverse). At n_fft=1024 the transform is small enough that the MXU
  beats XLA's FFT lowering; this is the Griffin-Lim hot path (32
  iterations of ISTFT→STFT per clip).

Backend choice is a global switch (set_stft_backend) so the DSP call
sites — GL, mel losses, audio-GAN STFT discriminators — stay unchanged.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_RDFT_BACKEND = "fft"


def set_stft_backend(name: str) -> None:
    global _RDFT_BACKEND
    assert name in ("fft", "matmul"), name
    _RDFT_BACKEND = name


def get_stft_backend() -> str:
    return _RDFT_BACKEND


@lru_cache(maxsize=8)
def _rdft_matrices(n_fft: int):
    """Forward rDFT matrices W (n_fft, n_freq): S = frames @ (Wre + i·Wim)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft     # (n_fft, n_freq)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=8)
def _irdft_matrices(n_fft: int):
    """Inverse rDFT synthesis matrices (n_freq, n_fft) with hermitian
    completion folded in: x = S_re @ Vre + S_im @ Vim."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft      # (n_freq, n_fft)
    c = np.full((n_freq, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    vre = (c * np.cos(ang) / n_fft).astype(np.float32)
    vim = (-c * np.sin(ang) / n_fft).astype(np.float32)
    return vre, vim


def _rfft_frames(frames: jnp.ndarray, n_fft: int, rdft: str) -> jnp.ndarray:
    """rfft over the last axis of real (..., n_fft) frames."""
    if rdft == "fft":
        return jnp.fft.rfft(frames, n=n_fft, axis=-1)
    wre, wim = _rdft_matrices(n_fft)
    # HIGHEST (true fp32 on the MXU) measured FASTER than the default
    # bf16 passes here - the converts around the default path dominate -
    # and keeps the transform exact (PROFILE_r03.json gl_rdft_ab).
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(wre), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(wim), precision=hi)
    return jax.lax.complex(re, im)


def _irfft_frames(spec: jnp.ndarray, n_fft: int, rdft: str) -> jnp.ndarray:
    """irfft over the last axis of complex (..., n_freq) frames."""
    if rdft == "fft":
        return jnp.fft.irfft(spec, n=n_fft, axis=-1)
    vre, vim = _irdft_matrices(n_fft)
    hi = jax.lax.Precision.HIGHEST
    return (jnp.matmul(jnp.real(spec), jnp.asarray(vre), precision=hi)
            + jnp.matmul(jnp.imag(spec), jnp.asarray(vim), precision=hi))


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches scipy.signal.get_window('hann', n))."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _frame_indices(n_samples: int, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + (n_samples - n_fft) // hop
    return (
        np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    )


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode", "win_length", "normalized", "rdft"))
def _stft_jit(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool,
    pad_mode: str,
    win_length: int,
    normalized: bool,
    rdft: str,
) -> jnp.ndarray:
    """Complex STFT of a (..., n_samples) signal → (..., n_freq, n_frames).

    Output layout matches librosa (freq-major) for drop-in mel matmuls.
    `win_length < n_fft` centre-pads the Hann window to n_fft and
    `normalized=True` divides by √n_fft — both with torch.stft semantics
    (used by the multi-scale audio GAN losses, audioloss_prior.py:72-77).
    """
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    idx = _frame_indices(x.shape[-1], n_fft, hop_length)
    frames = x[..., idx]  # (..., n_frames, n_fft)
    if win_length is None or win_length == n_fft:
        window = hann_window(n_fft, x.dtype)
    else:
        w = hann_window(win_length, x.dtype)
        left = (n_fft - win_length) // 2
        window = jnp.zeros((n_fft,), x.dtype).at[
            left : left + win_length].set(w)
    frames = frames * window
    spec = _rfft_frames(frames, n_fft, rdft)  # (..., n_frames, n_freq)
    if normalized:
        spec = spec / jnp.sqrt(n_fft).astype(x.dtype)
    return jnp.swapaxes(spec, -1, -2)


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    center: bool = True,
    pad_mode: str = "reflect",
    win_length: int = None,
    normalized: bool = False,
    rdft: str | None = None,
) -> jnp.ndarray:
    """See _stft_jit; the rDFT backend is resolved here (outside jit) so
    set_stft_backend takes effect even across cached compilations; an
    explicit ``rdft`` overrides the global (the Griffin-Lim hot path pins
    "matmul")."""
    return _stft_jit(x, n_fft, hop_length, center, pad_mode, win_length,
                     normalized, rdft or get_stft_backend())


def stft_magnitude(x, n_fft: int = 1024, hop_length: int = 256, power: float = 1.0):
    mag = jnp.abs(stft(x, n_fft=n_fft, hop_length=hop_length))
    if power != 1.0:
        mag = mag**power
    return mag


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length", "rdft"))
def _istft_jit(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    center: bool,
    length: int | None,
    rdft: str,
) -> jnp.ndarray:
    """Inverse STFT of (..., n_freq, n_frames) → (..., n_samples).

    Hann-squared overlap-add with window-sum normalisation (librosa.istft
    semantics). Requires hop_length | n_fft.
    """
    assert n_fft % hop_length == 0, "istft requires hop_length | n_fft"
    k = n_fft // hop_length
    win = hann_window(n_fft, jnp.float32)

    frames = _irfft_frames(jnp.swapaxes(spec, -1, -2), n_fft, rdft)
    frames = frames * win  # synthesis window

    n_frames = frames.shape[-2]
    batch_shape = frames.shape[:-2]
    n_blocks = n_frames + k - 1
    # split each frame into k hop-sized chunks; chunk j of frame i lands in
    # output block (i + j)
    chunks = frames.reshape(*batch_shape, n_frames, k, hop_length)
    out = jnp.zeros((*batch_shape, n_blocks, hop_length), dtype=frames.dtype)
    for j in range(k):
        out = out.at[..., j : j + n_frames, :].add(chunks[..., :, j, :])
    y = out.reshape(*batch_shape, n_blocks * hop_length)

    # window-sum normalisation (same decomposition on win**2)
    wsq = (win * win).reshape(k, hop_length)
    wsum = jnp.zeros((n_blocks, hop_length), dtype=frames.dtype)
    for j in range(k):
        wsum = wsum.at[j : j + n_frames, :].add(jnp.broadcast_to(wsq[j], (n_frames, hop_length)))
    wsum = wsum.reshape(n_blocks * hop_length)
    y = y / jnp.maximum(wsum, 1e-10)

    if center:
        y = y[..., n_fft // 2 :]
    if length is None:
        if center:
            # librosa convention: centered signal length = hop*(n_frames-1)
            return y[..., : (n_frames - 1) * hop_length]
        # uncentered: the full overlap-add covers hop*(n_frames-1) + n_fft
        return y[..., : (n_frames - 1) * hop_length + n_fft]
    if y.shape[-1] < length:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y[..., :length]


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    center: bool = True,
    length: int | None = None,
    rdft: str | None = None,
) -> jnp.ndarray:
    """See _istft_jit; the rDFT backend is resolved outside the jit key."""
    return _istft_jit(spec, n_fft, hop_length, center, length,
                      rdft or get_stft_backend())
