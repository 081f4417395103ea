"""A/B: packed-heads attention vs legacy split-heads, flagship UNet fwd.

Device-only timing: CHAIN UNet applications inside one lax.scan program,
single dispatch, scalar readback. Run on the real TPU.
"""
import dataclasses
import sys
import time

sys.path.insert(0, __import__("os").path.abspath(__import__("os").path.join(__import__("os").path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.utils.precision import cast_floating

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHAIN = 20
REPS = 3


def build():
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    params = jax.jit(ldm.init_params)(jax.random.PRNGKey(0))
    return ldm, cast_floating(params["unet"])


def timed(ldm, unet_params, label):
    x = jnp.zeros((BATCH, 16, 64, 4), jnp.bfloat16)
    t = jnp.zeros((BATCH,), jnp.float32)
    ctx = jnp.zeros((BATCH, 40, 768), jnp.bfloat16)

    def chain(p, x0):
        def body(y, _):
            y = ldm.unet.apply(p, y, t, ctx).astype(jnp.bfloat16)
            return y, None
        y, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.float32(y).sum()

    fn = jax.jit(chain)
    _ = float(fn(unet_params, x))  # compile + warm
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(fn(unet_params, x))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / CHAIN
    print(f"{label}: {ms:.2f} ms/call (batch {BATCH}, chain {CHAIN})")
    return ms


def main():
    set_attention_backend("pallas")
    ldm, p = build()

    packed = timed(ldm, p, "packed ")

    # legacy path: split -> per-head flash kernel -> merge (the shipped
    # round-4 computation), restored by monkeypatching the packed entry
    import diff_foley_tpu.models.attention as ma
    from diff_foley_tpu.ops import attention as att
    from diff_foley_tpu.ops import pallas_attention as pa

    def legacy(q, k, v, heads, scale=None, backend=None):
        return pa._merge_heads(att.multi_head_attention(
            pa._split_heads(q, heads), pa._split_heads(k, heads),
            pa._split_heads(v, heads), scale=scale))

    ma.multi_head_attention_packed = legacy
    unpacked = timed(ldm, p, "legacy ")
    print(f"speedup: {unpacked / packed:.3f}x")


if __name__ == "__main__":
    main()
