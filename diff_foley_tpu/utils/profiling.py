"""Profiling and cost analysis.

TPU-native replacement for the reference's fvcore FLOP counter
(`training/profile.py:18-158`) and CUDACallback epoch timing
(`stage2_ldm/main.py:49-69`): XLA's own cost model via
`jax.stages.Lowered.cost_analysis()`, wall-clock step timing with forced
host readback (the axon relay does not block in `block_until_ready`), and
`jax.profiler` trace capture for per-op timelines.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree, verbose: bool = False, name: str = "model") -> int:
    """Total parameter count of a pytree (util.py:251-255)."""
    total = sum(
        x.size for x in jax.tree.leaves(tree) if hasattr(x, "size")
    )
    if verbose:
        print(f"{name} has {total * 1e-6:.2f} M params.")
    return total


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes for a jittable fn at the given example args."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-device list
        costs = costs[0]
    return {
        "flops": float(costs.get("flops", 0.0)),
        "bytes_accessed": float(costs.get("bytes accessed", 0.0)),
        "transcendentals": float(costs.get("transcendentals", 0.0)),
    }


def timed_call(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Wall-clock a compiled fn with a forced scalar readback per batch of
    iterations. Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / iters, out


def _force(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "sum")]
    if leaves:
        float(leaves[0].sum())


def timed_chained(step_fn: Callable, x0, iters: int = 5, chain: int = 10):
    """Amortized per-call seconds: chain `step_fn` on its own output `chain`
    times with ONE scalar readback, median over `iters` trials.

    This is the canonical hot-loop measurement on the axon relay
    (docs/PERFORMANCE.md §2): block_until_ready doesn't block there and a
    single dispatch pays a ~25-30 ms round trip, so per-call timings of a
    2 ms kernel read as 27 ms unless the dispatch latency is amortized
    across a dependent chain. `step_fn` must map x -> same-shape/dtype x
    (cast inside if needed)."""
    out = step_fn(x0)
    _ = float(jnp.asarray(out, jnp.float32).sum())  # compile + settle
    times = []
    for _ in range(iters):
        x = x0
        t0 = time.time()
        for _c in range(chain):
            x = step_fn(x)
        _ = float(jnp.asarray(x, jnp.float32).sum())
        times.append((time.time() - t0) / chain)
    return float(np.median(times))


def timed_dispatch(fn: Callable, *args, iters: int = 5):
    """Median wall-seconds of a SINGLE dispatch + scalar readback — includes
    one relay round trip (~25-30 ms on the axon link). Compare against
    timed_chained to attribute dispatch latency."""
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _force(out)
        times.append(time.time() - t0)
    return float(np.median(times))


def flops_per_second(fn: Callable, *args, iters: int = 10) -> Dict[str, float]:
    costs = cost_analysis(fn, *args)
    jitted = jax.jit(fn)
    sec, _ = timed_call(jitted, *args, iters=iters)
    return {
        **costs,
        "seconds_per_call": sec,
        "tflops_per_second": costs["flops"] / sec / 1e12,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
