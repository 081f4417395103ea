"""A/B the flagship stage-2 train step: fp32 compute vs bf16 mixed precision.

Mixed precision = fp32 master params + optimizer state, bf16 forward/backward
(Stage2TrainConfig.compute_dtype="bfloat16") — the TPU-native replacement for
the reference's AMP fp16 + GradScaler (main.py precision=16, SURVEY.md §2.8).

Run on a QUIET machine (the axon relay timings are contention-sensitive):
    python scripts/bench_train_bf16.py [batch_size]

Prints one JSON line per mode with step time, samples/s, and train MFU.
"""
from __future__ import annotations

import dataclasses as dc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)
from diff_foley_tpu.utils.compile_cache import enable_compile_cache

V5E_BF16_PEAK = 197e12


def measure(compute_dtype, batch_size: int) -> dict:
    cfg = LDMConfig(unet=dc.replace(LDMConfig().unet, use_checkpoint=True))
    ldm = LatentDiffusion(cfg)
    tcfg = Stage2TrainConfig(mu_dtype="bfloat16", compute_dtype=compute_dtype)
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(
        jax.random.PRNGKey(0)
    )
    vae_params = jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1))
    batch = {
        "spec": jnp.zeros((batch_size, 128, 512, 3)),
        "video_feat": jnp.zeros((batch_size, 40, 512)),
    }
    step = jax.jit(make_train_step(ldm, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)
    state, metrics = step(state, vae_params, batch, rng)
    _ = float(metrics["loss"])  # forced readback: compile + first run
    times = []
    for _i in range(5):
        t0 = time.time()
        state, metrics = step(state, vae_params, batch, rng)
        _ = float(metrics["loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    out = {
        "compute_dtype": compute_dtype or "float32",
        "batch": batch_size,
        "train_step_ms": round(dt * 1e3, 1),
        "samples_per_s": round(batch_size / dt, 2),
        "loss": round(float(metrics["loss"]), 4),
    }
    try:
        costs = step.lower(state, vae_params, batch, rng).compile().cost_analysis()
        out["train_mfu_pct"] = round(
            100.0 * costs.get("flops", 0.0) / dt / V5E_BF16_PEAK, 1
        )
    except Exception:
        out["train_mfu_pct"] = None
    return out


def main():
    enable_compile_cache()
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    for mode in (None, "bfloat16"):
        try:
            print(json.dumps(measure(mode, batch_size)), flush=True)
        except Exception as e:
            print(json.dumps({"compute_dtype": mode or "float32",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
