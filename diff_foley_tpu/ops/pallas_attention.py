"""Fused multi-head attention as a Pallas TPU kernel.

The UNet's token counts are small (≤1024 latent tokens, 40 cond tokens) and
head dims are 40/80/160 — far below the MXU's 128 lanes.  The win over
unfused XLA here is keeping the whole (L, Lk) score matrix in VMEM and
fusing QKᵀ → softmax → PV into one kernel launch per (batch·head).

Layout note (measured, PROFILE_r03.json attn_nopad_ab): the kernel takes
its operands UNPADDED from HBM — Mosaic allows block dims equal to the
array dims, so the lane padding of the odd head dims (40/80) happens
in-VMEM right before the contraction dots instead of as explicit
`jnp.pad`/slice HBM round-trips. That removed the pad/copy ops at every
kernel boundary (~10% of UNet fwd device time in the padded design) and
fixed a pathological 2.8× on the (Lq=256, Lk=40) cross-attention shape.

For these sizes everything fits in VMEM (score matrix ≤ 4 MB fp32), so the
forward is a single-block fused kernel rather than a streaming flash loop;
shapes that would not fit fall back to the XLA path automatically.

Backward: a fused Pallas kernel streamed over query chunks — the XLA
recompute formula materialises the fp32 (L, L) probability matrix to HBM
twice per site (PROFILE_r03.json train_step shows those
f32[32,8,1024,1024] intermediates among the top backward ops); the kernel
keeps P and dS VMEM-resident per chunk, accumulating dK/dV across chunks
in revisited fp32 output blocks (TPU grids execute sequentially).
A/B on the shipped train step: 307.4 → 275.6 ms (+11.5% throughput).
Shapes the kernel can't tile fall back to the XLA formula.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _xla_reference(q, k, v, scale):
    # single source of truth for the XLA softmax-attention math
    from .attention import _xla_attention

    return _xla_attention(q, k, v, scale)


def _pad_lanes(x, d_pad: int):
    """Zero-pad the minor (lane) dim in VMEM; exact for contraction dots."""
    d = x.shape[-1]
    if d_pad > d:
        return jnp.pad(x, ((0, 0), (0, d_pad - d)))
    return x


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, d_pad: int):
    q = _pad_lanes(q_ref[0], d_pad)   # (Lq, D_pad)
    k = _pad_lanes(k_ref[0], d_pad)   # (Lk, D_pad)
    v = v_ref[0]                      # (Lk, D) — PV contracts over Lk
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale             # (Lq, Lk) fp32; no padded keys → no mask
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
    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale, d_pad=d_pad),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (lq * lk * d_pad * 2),
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
    )(qr, kr, vr)
    return out.reshape(b, h, lq, d)


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
                     dq_ref, dk_ref, dv_ref, *, scale: float, d_pad: int):
    """One query chunk of one (batch·head): recompute P for the chunk in
    VMEM, emit dQ for the chunk, accumulate dK/dV across chunks (grid dim 1
    is fastest, so the fp32 dK/dV blocks stay resident between visits)."""
    d = q_ref.shape[-1]
    q = _pad_lanes(q_ref[0], d_pad)   # (Qc, D_pad)
    k = _pad_lanes(k_ref[0], d_pad)   # (Lk, D_pad)
    v = _pad_lanes(v_ref[0], d_pad)
    g = _pad_lanes(g_ref[0], d_pad)   # (Qc, D_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale             # (Qc, Lk) fp32; no padded keys → no mask
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p_lp = p.astype(g.dtype)
    dv = jax.lax.dot_general(                  # Pᵀ g  → (Lk, D_pad)
        p_lp, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :d]
    gp = jax.lax.dot_general(                  # g Vᵀ → (Qc, Lk) fp32
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(          # dS K → (Qc, D_pad)
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale)[:, :d].astype(dq_ref.dtype)
    dk = (jax.lax.dot_general(                 # dSᵀ Q → (Lk, D_pad)
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale)[:, :d]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(pl.program_id(1) != 0)
    def _accum():
        dk_ref[0] += dk
        dv_ref[0] += dv


def _bwd_q_chunk(lq: int, lk: int, d: int = 128,
                 itemsize: int = 4) -> int | None:
    """Largest query-chunk size for which one grid step's working set —
    K/V input blocks, fp32 dK/dV accumulator blocks, the fp32 (Qc, Lk)
    score and dS buffers, and double-buffered Q/dO/dQ chunks — fits in
    VMEM (sized at lane-padded extents); None → XLA fallback."""
    lk_pad = _round_up(lk, 128)
    d_pad = _round_up(d, 128)
    fixed = (2 * itemsize + 2 * 4) * lk_pad * d_pad   # k,v in + f32 dk,dv out
    if fixed > 6 * 1024 * 1024:
        return None
    for qc in (512, 256, 128, 64, 32, 16, 8):
        if lq % qc != 0:
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
    qc = _bwd_q_chunk(lq, lk, d, q.dtype.itemsize)
    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    gr = g.reshape(b * h, lq, d)
    n_chunks = lq // qc

    kv_spec = pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    qg_spec = pl.BlockSpec((1, qc, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, d_pad=d_pad),
        grid=(b * h, n_chunks),
        in_specs=[qg_spec, kv_spec, kv_spec, qg_spec],
        out_specs=[qg_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lk, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * lq * lk * d_pad,
            bytes_accessed=3 * qr.size * q.dtype.itemsize
            + 2 * (kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
    )(qr, kr, vr, gr)
    dq = dq.reshape(b, h, lq, d)
    dk = dk.reshape(b, h, lk, d).astype(q.dtype)
    dv = dv.reshape(b, h, lk, d).astype(q.dtype)
    return dq, dk, dv


_BWD_IMPL = "pallas"  # "xla" forces the recompute formula (archived A/B)


def set_attention_bwd_impl(name: str) -> None:
    global _BWD_IMPL
    assert name in ("pallas", "xla"), name
    _BWD_IMPL = name


def _bwd(scale, res, g):
    q, k, v = res
    if (
        _BWD_IMPL != "pallas"
        or _bwd_q_chunk(q.shape[2], k.shape[2], q.shape[3],
                        q.dtype.itemsize) is None
    ):
        return _xla_bwd(scale, q, k, v, g)
    return _pallas_backward(q, k, v, g, scale)


flash_attention.defvjp(_fwd, _bwd)
