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


# ---------------------------------------------------------------------------
# Packed-heads forward: consume the projection output (B, L, H·D) directly.
#
# Motivation (PROFILE_r05.json): with per-head (B·H, L, D) operands the
# custom-call boundary is expensive in ways the kernel itself never sees —
# (a) XLA must MATERIALISE the (B, L, H, D)→(B, H, L, D) transposes on both
# sides of every call (the 7.6% `copy` bucket + off-layout residual
# `add_add_fusion`s running ~10× over add roofline), and (b) the TPU tiled
# layout T(8,128) pads the minor dim D=40→128, so every HBM byte of q/k/v/o
# is fetched 3.2× (bf16[128,1024,40] occupies 33.5 MB physical). Packing
# heads on the lane axis keeps the minor dim at H·D (320/640/1280 — ≤20%
# tile pad), and the operand layout equals the producing Dense's natural
# output layout, so NO transpose or copy exists at the boundary. Head
# extraction becomes static in-VMEM lane slices inside the kernel (a VPU
# relayout, ~KBs), and the per-head math is identical to _attn_kernel.
#
# The grid streams query chunks (grid = (B, Lq/Qc)) so the fp32 (Qc, Lk)
# score scratch bounds VMEM; K/V ride as full per-batch blocks revisited
# across chunks (sequential TPU grids skip the re-fetch).
# ---------------------------------------------------------------------------


def _attn_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        heads: int, d: int, d_pad: int):
    q = q_ref[0]                      # (Qc, H·D)
    k = k_ref[0]                      # (Lk, H·D)
    v = v_ref[0]
    outs = []
    for h in range(heads):            # static unroll: slices are lane-static
        qh = _pad_lanes(q[:, h * d:(h + 1) * d], d_pad)
        kh = _pad_lanes(k[:, h * d:(h + 1) * d], d_pad)
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                     # (Qc, Lk) fp32; no padded keys
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                            # (Qc, D) fp32
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _packed_q_chunk(lq: int, lk: int, hd: int, d: int,
                    itemsize: int) -> int | None:
    """Largest query-chunk for which one grid step fits VMEM: K/V blocks
    (×2 for double buffering), Q/O chunks (×2), one head's fp32 score +
    prob scratch, the padded per-head operands, and the fp32 concat
    staging; None → fall back to the split-heads path."""
    lk_pad = _round_up(lk, 128)
    d_pad = _round_up(d, 128)
    fixed = 2 * 2 * lk * hd * itemsize + lk * d_pad * itemsize
    if fixed > 7 * 1024 * 1024:
        return None
    for qc in (lq, 512, 256, 128, 64, 32, 16, 8):
        if qc > lq or lq % qc:
            continue
        per = (
            2 * 2 * qc * hd * itemsize        # q + out blocks, ×2 buffers
            + qc * lk_pad * (4 + itemsize)    # fp32 scores + low-prec probs
            + qc * d_pad * itemsize           # padded qh
            + qc * hd * 4                     # fp32 concat staging
        )
        if fixed + per <= 9 * 1024 * 1024:
            return qc
    return None


def _pallas_forward_packed(q3, k3, v3, scale: float, heads: int):
    b, lq, hd = q3.shape
    lk = k3.shape[1]
    d = hd // heads
    d_pad = _round_up(d, 128)
    qc = _packed_q_chunk(lq, lk, hd, d, q3.dtype.itemsize)
    kv_spec = pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, qc, hd), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_packed_kernel, scale=scale, heads=heads, d=d,
                d_pad=d_pad),
        grid=(b, lq // qc),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * heads * (lq * lk * d_pad * 2),
            bytes_accessed=(q3.size * 2 + k3.size + v3.size)
            * q3.dtype.itemsize,
            transcendentals=b * heads * lq * lk,
        ),
    )(q3, k3, v3)


def _split_heads(t, heads: int):
    b, l, hd = t.shape
    return t.reshape(b, l, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(t):
    b, h, l, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, l, h * d)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_packed(q3, k3, v3, scale: float, heads: int):
    """flash_attention over packed (B, L, H·D) operands — no transpose or
    layout copy at the custom-call boundary (see module comment above)."""
    hd = q3.shape[-1]
    d = hd // heads
    if (
        hd % heads
        or _packed_q_chunk(q3.shape[1], k3.shape[1], hd, d,
                           q3.dtype.itemsize) is None
    ):
        return _merge_heads(flash_attention(
            _split_heads(q3, heads), _split_heads(k3, heads),
            _split_heads(v3, heads), scale))
    return _pallas_forward_packed(q3, k3, v3, scale, heads)


def _packed_fwd(q3, k3, v3, scale, heads):
    return flash_attention_packed(q3, k3, v3, scale, heads), (q3, k3, v3)


def _attn_packed_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, *, scale: float,
                            heads: int, d: int, d_pad: int):
    """Packed twin of _attn_bwd_kernel: one query chunk of one batch row,
    all heads as a static lane-slice loop (same trick as the packed
    forward). dQ is emitted per chunk; fp32 dK/dV blocks are revisited
    across chunks (grid dim 1 fastest → blocks stay resident)."""
    q = q_ref[0]                      # (Qc, H·D)
    k = k_ref[0]                      # (Lk, H·D)
    v = v_ref[0]
    g = g_ref[0]                      # (Qc, H·D)
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        qh = _pad_lanes(q[:, h * d:(h + 1) * d], d_pad)
        kh = _pad_lanes(k[:, h * d:(h + 1) * d], d_pad)
        vh = _pad_lanes(v[:, h * d:(h + 1) * d], d_pad)
        gh = _pad_lanes(g[:, h * d:(h + 1) * d], d_pad)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                     # (Qc, Lk) fp32; no padded keys
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p_lp = p.astype(g.dtype)
        dvs.append(jax.lax.dot_general(           # Pᵀ g → (Lk, D_pad)
            p_lp, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :d])
        gp = jax.lax.dot_general(                 # g Vᵀ → (Qc, Lk) fp32
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        dqs.append((jax.lax.dot_general(          # dS K → (Qc, D_pad)
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)[:, :d])
        dks.append((jax.lax.dot_general(          # dSᵀ Q → (Lk, D_pad)
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)[:, :d])
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk = jnp.concatenate(dks, axis=-1)            # (Lk, H·D) fp32
    dv = jnp.concatenate(dvs, axis=-1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(pl.program_id(1) != 0)
    def _accum():
        dk_ref[0] += dk
        dv_ref[0] += dv


def _packed_bwd_q_chunk(lq: int, lk: int, hd: int, d: int,
                        itemsize: int) -> int | None:
    """VMEM sizing for the packed backward grid step: K/V input blocks
    (×2 buffers), fp32 dK/dV accumulator blocks, one head's padded
    operands, the fp32 (Qc, Lk) score/gp/dS scratch, Q/dO/dQ chunks, and
    concat staging; None → split-heads backward fallback. The budget is
    calibrated against Mosaic's ACTUAL scoped-vmem accounting on the
    flagship level-1 self-attn (Lk 1024, H·D 320): at qc=256 this model
    says 12.7 MB but Mosaic allocates 18 MB (> the 16 MB scoped limit),
    so the cap below is 11 MB in model units, which selects qc=128 for
    that shape — the shape the kernel exists for."""
    lk_pad = _round_up(lk, 128)
    d_pad = _round_up(d, 128)
    fixed = (
        2 * 2 * lk * hd * itemsize      # k, v input blocks, ×2 buffers
        + 2 * lk * hd * 4               # fp32 dK/dV accumulators
        + 3 * lk * d_pad * itemsize     # padded kh/vh + dS
        + 2 * lk * hd * 4               # dk/dv concat staging
    )
    if fixed > 10 * 1024 * 1024:
        return None
    for qc in (256, 128, 64, 32, 16, 8):
        if qc > lq or lq % qc:
            continue
        per = (
            2 * 3 * qc * hd * itemsize          # q, g in + dq out, ×2
            + qc * lk_pad * (2 * 4 + itemsize)  # s/p + gp/ds fp32, p low-prec
            + 2 * qc * d_pad * itemsize         # padded qh/gh
            + qc * hd * 4                       # dq concat staging
        )
        if fixed + per <= 11 * 1024 * 1024:
            return qc
    return None


def _pallas_backward_packed(q3, k3, v3, g3, scale: float, heads: int):
    b, lq, hd = q3.shape
    lk = k3.shape[1]
    d = hd // heads
    d_pad = _round_up(d, 128)
    qc = _packed_bwd_q_chunk(lq, lk, hd, d, q3.dtype.itemsize)
    kv_spec = pl.BlockSpec((1, lk, hd), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    qg_spec = pl.BlockSpec((1, qc, hd), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_packed_bwd_kernel, scale=scale, heads=heads, d=d,
                d_pad=d_pad),
        grid=(b, lq // qc),
        in_specs=[qg_spec, kv_spec, kv_spec, qg_spec],
        out_specs=[qg_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, hd), q3.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, lk, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * heads * lq * lk * d_pad,
            bytes_accessed=3 * q3.size * q3.dtype.itemsize
            + 2 * (k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=b * heads * lq * lk,
        ),
    )(q3, k3, v3, g3)
    return dq, dk.astype(q3.dtype), dv.astype(q3.dtype)


def _packed_bwd(scale, heads, res, g3):
    q3, k3, v3 = res
    hd = q3.shape[-1]
    if (
        _BWD_IMPL == "pallas"
        and hd % heads == 0
        and _packed_bwd_q_chunk(q3.shape[1], k3.shape[1], hd, hd // heads,
                                q3.dtype.itemsize) is not None
    ):
        return _pallas_backward_packed(q3, k3, v3, g3, scale, heads)
    # fallback: per-head backward (chunked Pallas kernel or XLA recompute —
    # same dispatch as flash_attention's own vjp); the split/merge
    # transposes run in the backward only, where the historical unpacked
    # forward already paid them
    dq, dk, dv = _bwd(scale, (_split_heads(q3, heads),
                              _split_heads(k3, heads),
                              _split_heads(v3, heads)),
                      _split_heads(g3, heads))
    return _merge_heads(dq), _merge_heads(dk), _merge_heads(dv)


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)
