"""Multi-head attention compute primitive.

Single entry point used by every transformer block in the model zoo, so the
backend can be swapped globally:

- ``xla``    — einsum + softmax; XLA fuses this well for the small token
  counts in this model family (≤1024 latent tokens, 40 cond tokens).
- ``pallas`` — fused flash-attention TPU kernel (ops/pallas_attention.py).

Shapes are (batch, heads, q_len, head_dim) etc.; softmax in fp32.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("DFT_ATTENTION_BACKEND", "xla")


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    backend: str | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, D) tensors.

    Reference semantics: `diff_foley/modules/diffusionmodules/attention_openai.py:170-186`
    (einsum + softmax, no masking — the model family never masks).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    be = backend or _BACKEND
    if be == "pallas":
        from .pallas_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def multi_head_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    backend: str | None = None,
) -> jnp.ndarray:
    """Attention over PACKED (B, L, H·D) projections — heads still on the
    lane (minor) axis, exactly as the to_q/to_k/to_v Dense layers emit them.

    Under the Pallas backend this avoids the (B,L,H,D)→(B,H,L,D) transposes
    XLA must materialise at a custom-call boundary AND the T(8,128) lane
    padding of per-head D=40/80 operands (3.2× HBM traffic) — see
    ops/pallas_attention.py packed-heads section. Under the XLA backend the
    split/merge below fuses into the einsums, producing the exact HLO the
    historical unpacked call produced (bit-identical)."""
    d = q.shape[-1] // heads
    if scale is None:
        scale = d**-0.5
    be = backend or _BACKEND
    if be == "pallas":
        from .pallas_attention import flash_attention_packed

        return flash_attention_packed(q, k, v, scale, heads)
    from .pallas_attention import _merge_heads, _split_heads

    return _merge_heads(_xla_attention(
        _split_heads(q, heads), _split_heads(k, heads),
        _split_heads(v, heads), scale))
