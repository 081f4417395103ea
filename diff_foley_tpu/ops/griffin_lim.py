"""On-device mel inversion: NNLS mel→STFT and Griffin-Lim phase recovery.

Reference behaviour (`data_preprocess/wav2spec.py:31-35`,
`training/stage2_ldm/adm/logger.py:1210-1226`): librosa 0.8
``mel_to_stft`` (NNLS) followed by ``griffinlim`` (n_iter=32, momentum=0.99,
random phase init).  Both are reimplemented as pure-jax loops so a whole batch
of 8-second clips inverts on the TPU — in the reference this step is the CPU
bottleneck.

NNLS here is accelerated projected gradient (FISTA) on the normal equations —
all matmuls, MXU-friendly — instead of librosa's per-block L-BFGS-B.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .mel import mel_filterbank
from .stft import istft, stft


@partial(jax.jit, static_argnames=("sr", "n_fft", "fmin", "fmax", "power", "n_iter"))
def mel_to_stft(
    mel_spec: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 1024,
    fmin: float = 125.0,
    fmax: float = 7600.0,
    power: float = 1.0,
    n_iter: int = 60,
) -> jnp.ndarray:
    """Invert a (..., n_mels, n_frames) mel magnitude to (..., n_freq, n_frames).

    Solves min_{S>=0} ||B S - M||_F^2 with FISTA, B the slaney filterbank.
    """
    B = mel_filterbank(sr, n_fft, mel_spec.shape[-2], fmin, fmax, mel_spec.dtype)
    BtB = B.T @ B  # (n_freq, n_freq)
    BtM = jnp.einsum("mf,...mt->...ft", B, mel_spec)

    # Lipschitz constant of the gradient = ||BtB||_2; power iteration.
    def _pow_iter(i, v):
        v = BtB @ v
        return v / (jnp.linalg.norm(v) + 1e-12)

    v0 = jnp.ones((BtB.shape[0],), dtype=mel_spec.dtype) / BtB.shape[0]
    v = jax.lax.fori_loop(0, 30, _pow_iter, v0)
    L = jnp.vdot(v, BtB @ v) / (jnp.vdot(v, v) + 1e-12)
    step = 1.0 / (L + 1e-6)

    # warm start: transpose-based projection (good init, keeps n_iter small)
    x0 = jnp.maximum(jnp.einsum("mf,...mt->...ft", B, mel_spec), 0.0)

    def body(i, carry):
        x, y, t = carry
        grad = jnp.einsum("fg,...gt->...ft", BtB, y) - BtM
        x_new = jnp.maximum(y - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (x0, x0, jnp.asarray(1.0, mel_spec.dtype))
    )
    if power != 1.0:
        x = jnp.power(x, 1.0 / power)
    return x


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_iter", "length", "rdft"))
def griffin_lim(
    spec_mag: jnp.ndarray,
    key: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    rdft: str = "matmul",
) -> jnp.ndarray:
    """Griffin-Lim phase recovery of a (..., n_freq, n_frames) magnitude.

    Random phase init + momentum acceleration, matching librosa 0.8 defaults
    used by the reference (`demo_util.py:196-211` at the corrected 16 kHz
    semantics).

    ``rdft="matmul"`` (default) runs the inner ISTFT/STFT transforms as
    fp32 MXU matmuls instead of XLA's FFT - measured 16% faster on the
    v5e at identical spectral convergence (PROFILE_r03.json gl_rdft_ab);
    pass "fft" for the XLA FFT lowering.
    """
    phase = jax.random.uniform(key, spec_mag.shape, dtype=jnp.float32)
    angles = jnp.exp(2j * jnp.pi * phase).astype(jnp.complex64)
    eps = 1e-16
    spec_c = spec_mag.astype(jnp.complex64)

    def body(i, carry):
        angles, rebuilt_prev = carry
        inverse = istft(spec_c * angles, n_fft=n_fft, hop_length=hop_length,
                        rdft=rdft)
        rebuilt = stft(inverse, n_fft=n_fft, hop_length=hop_length, rdft=rdft)
        angles_new = rebuilt - (momentum / (1.0 + momentum)) * rebuilt_prev
        angles_new = angles_new / (jnp.abs(angles_new) + eps)
        return angles_new, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    return istft(spec_c * angles, n_fft=n_fft, hop_length=hop_length,
                 length=length, rdft=rdft)
