"""Microbenchmark: XLA GroupNorm on VAE-scale maps (the fused-GN fallback).

PROFILE_r03.json (train_step) shows the frozen-VAE-encode GroupNorms as
top ops: a single stats pass over bf16[32,128,512,128] costs ~16 ms where
the HBM roofline says ~0.7 ms. This script measures effective bandwidth of
the exact `_xla_group_norm` formula on those shapes to decide whether a
streaming (HBM-resident) Pallas GroupNorm is worth building.

Run on the real TPU: python scripts/gn_microbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from diff_foley_tpu.ops.pallas_groupnorm import _xla_group_norm

SHAPES = [
    # (B, H, W, C, groups)  — VAE encoder/decoder maps (train step, batch 32)
    (32, 128, 512, 128, 32),
    (32, 64, 256, 256, 32),
    (32, 32, 128, 512, 32),
    # VAE decode at inference batch 16
    (16, 128, 512, 128, 32),
    # UNet map (small; the case where fused GN lost)
    (16, 16, 64, 320, 32),
]


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    for b, h, w, c, g in SHAPES:
        x = jnp.zeros((b, h, w, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        fn = jax.jit(
            lambda x, gamma, beta: _xla_group_norm(
                x, gamma, beta, g, 1e-6, "silu"
            )
        )
        out = fn(x, gamma, beta)
        out.block_until_ready()
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x, gamma, beta)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        bytes_min = 3 * x.size * 2  # read for stats + read for apply + write
        print(
            f"({b},{h},{w},{c}) g={g}: {dt*1e3:8.3f} ms  "
            f"eff {bytes_min/dt/1e9:7.1f} GB/s  "
            f"(roofline ~819 GB/s => {bytes_min/819e9*1e3:.2f} ms)"
        )


if __name__ == "__main__":
    main()
