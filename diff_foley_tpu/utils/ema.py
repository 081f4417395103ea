"""Exponential moving average of a parameter pytree.

Behavioural spec: reference LitEma (`diff_foley/modules/ema.py:5-76`) —
warmup-aware decay min(decay, (1+n)/(10+n)), shadow copy, swap-in/out.
Functional: state is (ema_params, num_updates).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params) -> EmaState:
    # explicit copy: the EMA tree must not alias the live params (donation
    # of a train state would otherwise donate the same buffer twice)
    return EmaState(
        jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        jnp.asarray(0, jnp.int32),
    )


def ema_update(state: EmaState, new_params, decay: float = 0.9999) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - d
    # preserve each leaf's dtype: one_minus is f32 (from the int counter)
    # and would promote bf16 EMA leaves, changing the carry structure of a
    # jitted train step between input and output state
    new_ema = jax.tree.map(
        lambda e, p: (e - one_minus * (e - p)).astype(e.dtype),
        state.params, new_params,
    )
    return EmaState(new_ema, n)
