"""Diagnosis A/B: is LayerNorm's C-axis reduction what forces the token
stream into the lane-hostile {1,2,0} layout (11x-roofline residual adds,
PROFILE_r05)?

Variants on the flagship UNet fwd, device-only chained timing:
  base    — shipped program (flax nn.LayerNorm, fp32 stats)
  noln    — LayerNorm stats disabled (scale/bias affine only)
  bf16ln  — stats computed in bf16 (no f32 convert in the stats fusion)

Run on the real TPU.
"""
import dataclasses
import sys
import time

sys.path.insert(0, __import__("os").path.abspath(__import__("os").path.join(__import__("os").path.dirname(__file__), "..")))

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.utils.precision import cast_floating

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHAIN = 20
REPS = 3

_RealLN = nn.LayerNorm


class _AffineOnlyLN(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


class _Bf16LN(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        y = (x - mean) * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, x.dtype))
        return (y.astype(jnp.float32) * scale + bias).astype(x.dtype)


def build():
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    params = jax.jit(ldm.init_params)(jax.random.PRNGKey(0))
    return ldm, cast_floating(params["unet"])


def timed(label):
    ldm, unet_params = build()
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
    _ = float(fn(unet_params, x))
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(fn(unet_params, x))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / CHAIN
    print(f"{label}: {ms:.2f} ms/call (batch {BATCH}, chain {CHAIN})",
          flush=True)
    return ms


def main():
    set_attention_backend("pallas")
    base = timed("base  ")
    nn.LayerNorm = _AffineOnlyLN
    noln = timed("noln  ")
    nn.LayerNorm = _Bf16LN
    bf16ln = timed("bf16ln")
    nn.LayerNorm = _RealLN
    print(f"noln speedup:   {base / noln:.3f}x")
    print(f"bf16ln speedup: {base / bf16ln:.3f}x")


if __name__ == "__main__":
    main()
