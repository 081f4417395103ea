"""Fused multi-head attention as a Pallas TPU kernel.

The UNet's token counts are small (≤1024 latent tokens, 40 cond tokens) and
head dims are 40/80/160 — far below the MXU's 128 lanes.  The win over
unfused XLA here is keeping the whole (L, Lk) score matrix in VMEM and
fusing QKᵀ → softmax → PV into one kernel launch per (batch·head), with the
head dim zero-padded to the 128-lane boundary (zero padding is exact for
QKᵀ and PV; padded key positions are masked with -inf before the softmax).

For these sizes everything fits in VMEM (score matrix ≤ 4 MB fp32), so this
is a single-block fused kernel rather than a streaming flash loop; shapes
that would not fit fall back to the XLA path automatically.

Backward: custom_vjp recomputes attention with the standard XLA formula —
training keeps full-fidelity gradients while inference gets the fused
forward.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _xla_reference(q, k, v, scale):
    # single source of truth for the XLA softmax-attention math
    from .attention import _xla_attention

    return _xla_attention(q, k, v, scale)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]          # (Lq_pad, D_pad)
    k = k_ref[0]          # (Lk_pad, D_pad)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale             # (Lq_pad, Lk_pad) fp32
    if kv_len < scores.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < kv_len, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pallas_forward(q, k, v, scale):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    d_pad = _round_up(d, 128)
    lq_pad = _round_up(lq, 8)
    lk_pad = _round_up(lk, 128)

    def pad(x, l_pad):
        return jnp.pad(
            x.reshape(b * h, x.shape[2], d),
            ((0, 0), (0, l_pad - x.shape[2]), (0, d_pad - d)),
        )

    qp, kp, vp = pad(q, lq_pad), pad(k, lk_pad), pad(v, lk_pad)

    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale, kv_len=lk),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, lq_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_pad, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (lq_pad * lk_pad * d_pad * 2),
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_pad * lk_pad,
        ),
    )(qp, kp, vp)
    return out[:, :lq, :d].reshape(b, h, lq, d)


def _fits_vmem(q, k) -> bool:
    lq = _round_up(q.shape[2], 8)
    lk = _round_up(k.shape[2], 128)
    d = _round_up(q.shape[3], 128)
    # q + k + v + scores + out, fp32-ish, with headroom under the 16 MB VMEM
    bytes_needed = 4 * (lq * d * 2 + lk * d * 2 + lq * lk)
    return bytes_needed < 10 * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale):
    if not _fits_vmem(q, k):
        return _xla_reference(q, k, v, scale)
    return _pallas_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    # standard attention backward via recompute (XLA fuses this well)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    gv = jnp.einsum("bhqk,bhqd->bhkd", p.astype(g.dtype), g)
    gp = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    # softmax backward
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    gq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    gk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return gq, gk, gv


flash_attention.defvjp(_fwd, _bwd)
