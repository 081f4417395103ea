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
