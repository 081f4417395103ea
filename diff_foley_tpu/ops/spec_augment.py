"""SpecAugment: time/frequency stripe dropout.

Behavioural spec: reference `open_clip/aug_utils.py:51-76` (SpecAugmentation
with DropStripes on time and frequency axes), opt-in via --use_spec_aug
(model.py:486-488). Functional jax version: fixed stripe counts, uniform
widths/offsets per sample.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("time_drop_width", "time_stripes",
                                   "freq_drop_width", "freq_stripes"))
def spec_augment(
    spec: jnp.ndarray,
    key: jax.Array,
    time_drop_width: int = 64,
    time_stripes: int = 2,
    freq_drop_width: int = 8,
    freq_stripes: int = 2,
) -> jnp.ndarray:
    """(B, n_mels, T) → masked copy (PANN defaults)."""
    b, m, t = spec.shape

    def stripes(key, axis_len, width, n, axis):
        # exact reference distributions (aug_utils.py:42-43):
        # width ~ randint[0, drop_width)  (high exclusive),
        # start ~ randint[0, axis_len - width_sampled)  (depends on the
        # sampled width, so stripes can end anywhere up to the axis edge)
        if width <= 0 or n <= 0:  # degenerate config → no-op mask
            return jnp.ones(
                (b, 1, axis_len) if axis == 2 else (b, axis_len, 1),
                spec.dtype,
            )
        ks = jax.random.split(key, 2)
        widths = jax.random.randint(ks[0], (b, n), 0, width)
        u = jax.random.uniform(ks[1], (b, n))
        # clamp so a drop_width > axis_len config can't produce negative starts
        starts = jnp.floor(
            u * jnp.maximum(axis_len - widths, 1)
        ).astype(jnp.int32)
        pos = jnp.arange(axis_len)
        # mask[b, x] = any stripe covers x
        cover = (
            (pos[None, None, :] >= starts[..., None])
            & (pos[None, None, :] < (starts + widths)[..., None])
        ).any(axis=1)
        shape = (b, 1, axis_len) if axis == 2 else (b, axis_len, 1)
        return 1.0 - cover.reshape(shape).astype(spec.dtype)

    k1, k2 = jax.random.split(key)
    mask_t = stripes(k1, t, time_drop_width, time_stripes, axis=2)
    mask_f = stripes(k2, m, freq_drop_width, freq_stripes, axis=1)
    return spec * mask_t * mask_f
