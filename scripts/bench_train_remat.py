"""Measure the flagship stage-2 train step under each remat save-policy.

Run on a QUIET machine (the axon relay timings are contention-sensitive):
    python scripts/bench_train_remat.py [batch_size]

Prints one JSON line per policy: {"policy": ..., "train_step_ms": ...}.
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


def measure(policy: str, batch_size: int) -> float:
    cfg = LDMConfig(
        unet=dc.replace(
            LDMConfig().unet, use_checkpoint=True, remat_policy=policy
        )
    )
    ldm = LatentDiffusion(cfg)
    tcfg = Stage2TrainConfig(mu_dtype="bfloat16")
    state = init_train_state(ldm, jax.random.PRNGKey(0), tcfg)
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
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
    return float(np.median(times))


def main():
    enable_compile_cache()
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for policy in ("none", "dots_no_batch", "dots"):
        try:
            dt = measure(policy, batch_size)
            print(json.dumps({
                "policy": policy, "batch": batch_size,
                "train_step_ms": round(dt * 1e3, 1),
                "samples_per_s": round(batch_size / dt, 2),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"policy": policy, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
