"""Device-resident training: many optimizer steps per host dispatch.

TPU-native hot-loop shape the torch reference has no analogue for: its
Lightning loop pays a host→device round trip per step, which is noise for
the 860M flagship (280 ms steps) but DOMINATES small-model training — on
the axon relay a single dispatch+readback costs ~30 ms, so a 5 ms tiny-model
step runs at 14% duty cycle when host-driven. `scan_train` rolls K steps
into one `lax.scan` program: the batches for all K steps are staged into
device memory up front (or gathered on device from a resident dataset via
`index_fn`) and the host sees one dispatch per K steps.

Used by the functional quality gate (scripts/quality_gate.py) to train the
tiny four-stage recipe tens of thousands of steps in minutes; applicable to
any NamedTuple train state whose step folds its RNG by `state.step`
(both framework trainers do — train/classifier.py, train/stage2_ldm.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def scan_train(
    step_fn: Callable,
    state: Any,
    batches: Dict[str, jnp.ndarray],
    rng: jax.Array,
    static_args: Tuple = (),
    index_fn: Optional[Callable[[Any, jnp.ndarray], Dict]] = None,
):
    """Run K = leading-axis steps of `step_fn` on device.

    step_fn: (state, *static_args, batch, rng) → (state, metrics) — a
      framework train step (already fold_in's rng by state.step, so a single
      rng key is safe across the scan).
    batches: pytree whose leaves have leading axis K; slice k feeds step k.
      With `index_fn`, `batches` is instead any per-step carrier (e.g. an
      index array (K, B)) and `index_fn(xs_k, step)` materialises the batch
      on device — the resident-dataset gather pattern.

    Returns (state, metrics) with metrics stacked over K.
    """

    def body(carry, xs):
        st = carry
        batch = index_fn(xs, st.step) if index_fn is not None else xs
        st, metrics = step_fn(st, *static_args, batch, rng)
        return st, metrics

    return jax.lax.scan(body, state, batches)


def jit_scan_train(step_fn, static_argnums_donate: bool = True):
    """jit wrapper: scan_train with the state donated (in-place update)."""
    fn = lambda state, batches, rng, *static: scan_train(  # noqa: E731
        step_fn, state, batches, rng, static_args=static
    )
    return jax.jit(fn, donate_argnums=(0,))
