"""Batched STFT / ISTFT on device via XLA's real FFT.

Matches librosa 0.8.0 semantics used by the reference mel pipeline
(`data_preprocess/wav2spec.py:37`): centered frames, reflect padding, periodic
Hann window, win_length = n_fft.

Framing is a gather with a precomputed (frames, win) index matrix; overlap-add
in :func:`istft` exploits hop | n_fft to decompose each frame into
``n_fft // hop`` aligned blocks, so reconstruction is a few shifted adds
instead of a scatter (TPU-friendly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode", "win_length", "normalized"))
def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    center: bool = True,
    pad_mode: str = "reflect",
    win_length: int = None,
    normalized: bool = False,
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
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., n_frames, n_freq)
    if normalized:
        spec = spec / jnp.sqrt(n_fft).astype(x.dtype)
    return jnp.swapaxes(spec, -1, -2)


def stft_magnitude(x, n_fft: int = 1024, hop_length: int = 256, power: float = 1.0):
    mag = jnp.abs(stft(x, n_fft=n_fft, hop_length=hop_length))
    if power != 1.0:
        mag = mag**power
    return mag


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of (..., n_freq, n_frames) → (..., n_samples).

    Hann-squared overlap-add with window-sum normalisation (librosa.istft
    semantics). Requires hop_length | n_fft.
    """
    assert n_fft % hop_length == 0, "istft requires hop_length | n_fft"
    k = n_fft // hop_length
    win = hann_window(n_fft, jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
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
