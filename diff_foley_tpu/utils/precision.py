"""Mixed-precision helpers.

The reference trains with AMP fp16 + GradScaler (SURVEY.md §2.8); on TPU the
native policy is bf16 compute with fp32 master params and fp32 norm
statistics (GroupNorm32 already computes in fp32 regardless of input dtype),
no loss scaler needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves of a pytree (e.g. params for inference)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
