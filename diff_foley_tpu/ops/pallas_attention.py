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

Backward: a fused Pallas kernel streamed over query chunks — the XLA
recompute formula materialises the fp32 (L, L) probability matrix to HBM
twice per site (PROFILE_r03.json train_step shows those
f32[32,8,1024,1024] intermediates among the top backward ops); the kernel
keeps P and dS VMEM-resident per chunk, accumulating dK/dV across chunks
in revisited fp32 output blocks (TPU grids execute sequentially).
Shapes the kernel can't tile fall back to the XLA formula.
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


def _xla_bwd(scale, q, k, v, g):
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


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int):
    """One query chunk of one (batch·head): recompute P for the chunk in
    VMEM, emit dQ for the chunk, accumulate dK/dV across chunks (grid dim 1
    is fastest, so the fp32 dK/dV blocks stay resident between visits)."""
    q = q_ref[0]          # (Qc, D_pad)
    k = k_ref[0]          # (Lk_pad, D_pad)
    v = v_ref[0]
    g = g_ref[0]          # (Qc, D_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale             # (Qc, Lk_pad) fp32
    if kv_len < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p_lp = p.astype(g.dtype)
    dv = jax.lax.dot_general(                  # Pᵀ g  → (Lk_pad, D_pad)
        p_lp, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gp = jax.lax.dot_general(                  # g Vᵀ → (Qc, Lk_pad) fp32
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(          # dS K → (Qc, D_pad)
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    dk = jax.lax.dot_general(                  # dSᵀ Q → (Lk_pad, D_pad)
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(pl.program_id(1) != 0)
    def _accum():
        dk_ref[0] += dk
        dv_ref[0] += dv


def _bwd_q_chunk(lq_pad: int, lk_pad: int, d_pad: int = 128,
                 itemsize: int = 4) -> int | None:
    """Largest query-chunk size for which one grid step's working set —
    K/V input blocks, fp32 dK/dV accumulator blocks, the fp32 (Qc, Lk_pad)
    score and dS buffers, and double-buffered Q/dO/dQ chunks — fits in
    VMEM; None → XLA fallback."""
    fixed = (2 * itemsize + 2 * 4) * lk_pad * d_pad   # k,v in + f32 dk,dv out
    if fixed > 6 * 1024 * 1024:
        return None
    for qc in (512, 256, 128, 64, 32, 16, 8):
        if lq_pad % qc != 0:
            continue
        scores = 2 * 4 * qc * lk_pad                  # s/p + gp/ds fp32
        chunked = 2 * 3 * qc * d_pad * itemsize       # q, g, dq ×2 buffers
        if fixed + scores + chunked <= 10 * 1024 * 1024:
            return qc
    return None


def _pallas_backward(q, k, v, g, scale):
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

    qc = _bwd_q_chunk(lq_pad, lk_pad, d_pad, q.dtype.itemsize)
    qp, kp, vp, gp = pad(q, lq_pad), pad(k, lk_pad), pad(v, lk_pad), pad(g, lq_pad)
    n_chunks = lq_pad // qc

    kv_spec = pl.BlockSpec((1, lk_pad, d_pad), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    qg_spec = pl.BlockSpec((1, qc, d_pad), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, kv_len=lk),
        grid=(b * h, n_chunks),
        in_specs=[qg_spec, kv_spec, kv_spec, qg_spec],
        out_specs=[qg_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * lq_pad * lk_pad * d_pad,
            bytes_accessed=(qp.size + gp.size + qp.size) * q.dtype.itemsize
            + 2 * (kp.size + vp.size) * q.dtype.itemsize,
            transcendentals=b * h * lq_pad * lk_pad,
        ),
    )(qp, kp, vp, gp)
    dq = dq[:, :lq, :d].reshape(b, h, lq, d)
    dk = dk[:, :lk, :d].reshape(b, h, lk, d).astype(q.dtype)
    dv = dv[:, :lk, :d].reshape(b, h, lk, d).astype(q.dtype)
    return dq, dk, dv


_BWD_IMPL = "pallas"  # "xla" forces the recompute formula (archived A/B)


def set_attention_bwd_impl(name: str) -> None:
    global _BWD_IMPL
    assert name in ("pallas", "xla"), name
    _BWD_IMPL = name


def _bwd(scale, res, g):
    q, k, v = res
    lq_pad = _round_up(q.shape[2], 8)
    lk_pad = _round_up(k.shape[2], 128)
    d_pad = _round_up(q.shape[3], 128)
    if (
        _BWD_IMPL != "pallas"
        or _bwd_q_chunk(lq_pad, lk_pad, d_pad, q.dtype.itemsize) is None
    ):
        return _xla_bwd(scale, q, k, v, g)
    return _pallas_backward(q, k, v, g, scale)


flash_attention.defvjp(_fwd, _bwd)
