"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

Motivation (PROFILE_r03.json): at the shipped operating point 29% of UNet
device time is `convert_reduce_fusion` — XLA materialises a separate
fp32 statistics pass over every normalised activation, then re-reads the
activation in the apply fusion. This kernel computes group statistics AND
applies normalise→affine→SiLU in one VMEM-resident pass: one HBM read and
one write per GroupNorm instead of two reads and a write.

Design notes:
- grid over batch; each step holds one sample's full (H, W, C) map in VMEM
  (UNet maps are ≤ 1.3 MB bf16; shapes that don't fit fall back to XLA).
- group sums via a (C, G) one-hot matmul — C stays on the 128-lane axis,
  no (…, G, C/G) reshape with a tiny trailing dim.
- statistics in fp32 with use_fast_variance semantics (E[x²] − E[x]²),
  matching flax nn.GroupNorm; the GroupNorm32 fp32-cast contract
  (reference util.py:214-218) is inherent: everything inside is fp32.
- backward: custom_vjp recomputes through the XLA reference formula, so
  training gradients are full-fidelity XLA while inference gets the fused
  forward (same pattern as ops/pallas_attention.py).

Backend switch mirrors ops.attention: default "xla" (bit-identical to the
existing GroupNorm32 path); bench/serving enable "pallas".
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BACKEND = "xla"


def set_groupnorm_backend(name: str) -> None:
    """Backends:
    - "xla": flax-equivalent formula everywhere (default and the measured
      winner at every size — see below).
    - "pallas": currently identical to "xla" by policy. Both custom GN
      kernels lost their A/Bs on the real chip: the single-block kernel at
      UNet sizes (launch overhead + layout copies, PROFILE_r03.json
      fused_gn_ab) and the streaming two-kernel pass at VAE sizes (XLA's
      GN already sustains ~680 GB/s of a ~700 GB/s practical roofline;
      the split stats/apply kernels re-read x from HBM without the
      neighbouring-op fusion XLA gets — scripts/gn_microbench.py). The
      backend name is kept so callers (bench/serving) stay stable if the
      policy flips on future hardware.
    - "pallas-stream": force the streaming two-kernel pass on HBM-resident
      maps (archived experiment).
    - "pallas-block": force the single-block kernel on VMEM-resident maps
      (archived experiment).
    """
    global _BACKEND
    assert name in ("xla", "pallas", "pallas-stream", "pallas-block"), name
    _BACKEND = name


def get_groupnorm_backend() -> str:
    return _BACKEND


def _xla_group_norm(x, gamma, beta, groups, eps, act):
    """Reference formula (flax GroupNorm math, fp32, fast variance)."""
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = (xf * xf).mean(axis=(1, 3), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * gamma + beta
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float,
               act, hw: int):
    xb = x_ref[...].astype(jnp.float32)    # (Bb, H, W, C)
    bb, h, w, c = xb.shape
    cg = c // groups
    x3d = xb.reshape(bb, h * w, c)
    # (Bb, 2C): per-item per-channel sums of x and x² side by side
    # (Mosaic wants ≥2-D dots; the two moments ride as column blocks)
    s = jnp.concatenate(
        [jnp.sum(x3d, axis=1), jnp.sum(x3d * x3d, axis=1)], axis=1
    )
    # channel→group one-hot (C, G): group g owns channels [g·cg, (g+1)·cg)
    chan_g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (chan_g == grp).astype(jnp.float32)
    zero = jnp.zeros_like(m)
    m2 = jnp.concatenate(        # (2C, 2G) block-diagonal [m 0; 0 m]
        [jnp.concatenate([m, zero], axis=1),
         jnp.concatenate([zero, m], axis=1)], axis=0,
    )
    n = float(hw * cg)
    g12 = jax.lax.dot_general(             # (Bb, 2G) group sums [Σx | Σx²]
        s, m2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # fp32 stats: TPU DEFAULT
    )                                         # truncates to bf16 passes
    mean_g = g12[:, :groups] / n           # (Bb, G)
    var_g = g12[:, groups:] / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    stats = jnp.concatenate([mean_g, inv_g], axis=1)   # (Bb, 2G)
    per_c = jax.lax.dot_general(           # (Bb, 2C): [mean_c | inv_c]
        stats, m2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_c = per_c[:, :c].reshape(bb, 1, c)    # basic slices only: mixing
    inv_c = per_c[:, c:].reshape(bb, 1, c)     # None+slice lowers as gather
    y = (x3d - mean_c) * inv_c \
        * g_ref[...].reshape(1, 1, c) + b_ref[...].reshape(1, 1, c)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.reshape(bb, h, w, c).astype(o_ref.dtype)


def fits_vmem(shape) -> bool:
    """One sample's map must fit in VMEM alongside its fp32 copy."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return 8 * h * w * c < 10 * 1024 * 1024  # in(f32) + out + headroom


def _pallas_forward(x, gamma, beta, groups, eps, act):
    b, h, w, c = x.shape
    # as many batch items per grid step as fit VMEM (fewer kernel launches)
    per_item = 8 * h * w * c
    bb = 1
    for cand in (8, 4, 2):
        if b % cand == 0 and cand * per_item < 10 * 1024 * 1024:
            bb = cand
            break
    out = pl.pallas_call(
        partial(_gn_kernel, groups=groups, eps=eps, act=act, hw=h * w),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size if act else 0,
        ),
    )(x, gamma.astype(jnp.float32), beta.astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Streaming GroupNorm for HBM-resident maps (full-res VAE encoder/decoder).
#
# Motivation (scripts/gn_microbench.py on the real v5e): XLA's GN on e.g.
# bf16[32,128,512,128] sustains ~130 GB/s effective against an ~819 GB/s
# roofline — the fp32 convert+reduce materialisation pattern is 4–11× off
# bandwidth on maps too large for the single-block kernel. Two grid-streamed
# kernels fix the access pattern: (1) a stats sweep accumulating per-channel
# Σx/Σx² fp32 into a (B, 2C) block revisited across row-chunks (TPU grids are
# sequential, so revisiting accumulates), (2) an apply sweep computing
# y = x·a + b (+SiLU) with the per-(B,C) affine folded on the host side.
# Total traffic: 2 reads + 1 write of x at streaming bandwidth.
# ---------------------------------------------------------------------------

_STREAM_BLOCK_BYTES = 2 * 1024 * 1024  # per-chunk VMEM budget (×2 buffers)


def _stream_chunk_rows(h: int, w: int, c: int, itemsize: int):
    """Largest divisor of h whose (hc, w, c) chunk fits the VMEM budget."""
    row_bytes = w * c * itemsize
    for hc in range(h, 0, -1):
        if h % hc == 0 and hc * row_bytes <= _STREAM_BLOCK_BYTES:
            return hc
    return None


def stream_eligible(shape, groups: int, itemsize: int = 2) -> bool:
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if c % groups != 0 or c % 128 != 0:
        return False
    return _stream_chunk_rows(h, w, c, itemsize) is not None


def _stream_stats_kernel(x_ref, o_ref):
    xb = x_ref[...].astype(jnp.float32)          # (1, hc, W, C)
    x2d = xb.reshape(-1, xb.shape[-1])
    s = jnp.concatenate(
        [jnp.sum(x2d, axis=0, keepdims=True),
         jnp.sum(x2d * x2d, axis=0, keepdims=True)], axis=1,
    )[None]                                      # (1, 1, 2C)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = s

    @pl.when(pl.program_id(1) != 0)
    def _accum():
        o_ref[...] = o_ref[...] + s


def _stream_apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act):
    x = x_ref[...].astype(jnp.float32)           # (1, hc, W, C)
    c = x.shape[-1]
    y = x * a_ref[...].reshape(1, 1, 1, c) + b_ref[...].reshape(1, 1, 1, c)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _streaming_forward(x, gamma, beta, groups, eps, act):
    b, h, w, c = x.shape
    hc = _stream_chunk_rows(h, w, c, x.dtype.itemsize)
    n_chunks = h // hc
    sums = pl.pallas_call(
        _stream_stats_kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hc, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 2 * c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x)
    # tiny (B, ·) epilogue: group moments → per-channel affine, in XLA
    cg = c // groups
    n = float(h * w * cg)
    gs = sums.reshape(b, 2, groups, cg).sum(axis=3)       # (B, 2, G)
    mean = gs[:, 0] / n
    var = gs[:, 1] / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)                         # (B, G)
    mean_c = jnp.repeat(mean, cg, axis=1)                  # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    a = (inv_c * gamma[None].astype(jnp.float32))[:, None]    # (B, 1, C)
    bb = beta[None, None].astype(jnp.float32) - mean_c[:, None] * a
    return pl.pallas_call(
        partial(_stream_apply_kernel, act=act),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hc, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * x.size,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size if act else 0,
        ),
    )(x, a, bb)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, gamma, beta, groups, eps, act=None):
    """GroupNorm→affine(→SiLU) with a backend-dependent execution plan.

    Policy (see set_groupnorm_backend): the XLA formula won every A/B on
    the real chip, so "pallas" currently routes everything to it; the
    "pallas-stream"/"pallas-block" backends force the archived custom
    kernels for re-measurement on future hardware."""
    backend = get_groupnorm_backend()
    if x.shape[-1] % groups != 0:
        return _xla_group_norm(x, gamma, beta, groups, eps, act)
    if backend == "pallas-block" and fits_vmem(x.shape):
        return _pallas_forward(x, gamma, beta, groups, eps, act)
    if (
        backend == "pallas-stream"
        and not fits_vmem(x.shape)
        and stream_eligible(x.shape, groups, x.dtype.itemsize)
    ):
        return _streaming_forward(x, gamma, beta, groups, eps, act)
    return _xla_group_norm(x, gamma, beta, groups, eps, act)


def _fwd(x, gamma, beta, groups, eps, act):
    return fused_group_norm(x, gamma, beta, groups, eps, act), (x, gamma, beta)


def _bwd(groups, eps, act, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_group_norm(a, b, c, groups, eps, act),
        x, gamma, beta,
    )
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)
