"""A/B: packed Pallas attention BACKWARD kernel vs the split-heads
fallback, on the shipped flagship stage-2 train step (bf16, no remat,
batch 32, pallas attention). Run on the real TPU."""
import sys
import time

sys.path.insert(0, __import__("os").path.abspath(__import__("os").path.join(__import__("os").path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)
from diff_foley_tpu.utils.compile_cache import enable_compile_cache

BATCH = 32


def measure(label):
    ldm = LatentDiffusion(LDMConfig())
    tcfg = Stage2TrainConfig(mu_dtype="bfloat16", compute_dtype="bfloat16")
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(
        jax.random.PRNGKey(0))
    vae_params = jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1))
    batch = {
        "spec": jnp.zeros((BATCH, 128, 512, 3)),
        "video_feat": jnp.zeros((BATCH, 40, 512)),
    }
    step = jax.jit(make_train_step(ldm, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)
    state, metrics = step(state, vae_params, batch, rng)
    loss0 = float(metrics["loss"])
    times = []
    for _ in range(7):
        t0 = time.time()
        state, metrics = step(state, vae_params, batch, rng)
        _ = float(metrics["loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    print(f"{label}: {dt*1e3:.1f} ms/step ({BATCH/dt:.1f} samples/s), "
          f"first-step loss {loss0:.6f}", flush=True)
    return dt


def main():
    enable_compile_cache()
    set_attention_backend("pallas")
    packed = measure("packed-bwd  ")

    from diff_foley_tpu.ops import pallas_attention as pa
    pa._packed_bwd_q_chunk = lambda *a, **k: None
    fallback = measure("split-bwd   ")
    print(f"speedup: {fallback / packed:.3f}x")


if __name__ == "__main__":
    main()
