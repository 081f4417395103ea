"""Spatial transformer blocks for the UNet (cross-attention conditioning).

Behavioural spec: reference `diff_foley/modules/diffusionmodules/
attention_openai.py` — SpatialTransformer (GroupNorm eps 1e-6 → 1×1 proj →
flatten h·w tokens → BasicTransformerBlock(s) → zero-init 1×1 proj + residual)
with BasicTransformerBlock = self-attn → cross-attn → GEGLU FF, each residual.

TPU-first notes: tokens stay in NHWC-flattened (B, L, C); attention math goes
through :func:`diff_foley_tpu.ops.attention.multi_head_attention` so the
backend (XLA fused vs Pallas flash kernel) is swappable; GEGLU uses exact
(erf) GELU to match torch's default.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention_packed
from .layers import conv1x1


def _remat_policy_fn(name: str):
    """Remat save-policy by name. "dots" keeps matmul results from the
    forward (backward skips recomputing QK^T/PV/FFN matmuls at the cost of
    activation HBM); "dots_no_batch" keeps only contraction results with no
    batch dims (cheap, mostly FFN weights-side); "none" recomputes all."""
    if name in ("none", None, ""):
        return None
    return {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "dots_no_batch":
            jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
    }[name]


class CrossAttention(nn.Module):
    """Q from x, K/V from context (attention_openai.py:152-193).

    Linear projections have no bias (to_q/to_k/to_v); output proj has bias.
    """

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        # heads stay PACKED on the lane axis end to end: the packed entry
        # avoids materialised transposes + 3.2× lane-pad HBM traffic at the
        # Pallas custom-call boundary, and compiles to the identical HLO
        # under the XLA backend (ops/attention.py)
        out = multi_head_attention_packed(
            q, k, v, self.heads, scale=self.dim_head**-0.5
        )
        out = nn.Dense(x.shape[-1], name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class GEGLU(nn.Module):
    """Two Dense projections instead of torch's one Dense(2F)+split: under
    tensor parallelism each kernel column-shards over the `model` axis
    independently, so x·gelu(gate) stays shard-local (a single (d, 2F)
    kernel split at F puts x and gate on disjoint device groups and forces
    a reshard collective in every FeedForward). The converter splits the
    reference's stacked weight rows (attention_openai.py:126-149)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out, name="proj_x")(x)
        gate = nn.Dense(self.dim_out, name="proj_gate")(x)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU MLP with mult=4 (attention_openai.py:126-149)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = GEGLU(self.dim * self.mult, name="geglu")(x)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → FF, pre-LN residuals (attention_openai.py:196-215)."""

    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        x = x + CrossAttention(
            self.heads, self.dim_head, self.dropout, name="attn1"
        )(nn.LayerNorm(name="norm1")(x), None, deterministic)
        x = x + CrossAttention(
            self.heads, self.dim_head, self.dropout, name="attn2"
        )(nn.LayerNorm(name="norm2")(x), context, deterministic)
        x = x + FeedForward(x.shape[-1], dropout=self.dropout, name="ff")(
            nn.LayerNorm(name="norm3")(x), deterministic
        )
        return x


class SpatialTransformer(nn.Module):
    """Token-space transformer over an NHWC feature map (attention_openai.py:218-263)."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    remat: bool = False
    remat_policy: str = "none"  # none | dots | dots_no_batch — what the
    #                             rematted blocks may keep from the forward

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        x = conv1x1(inner, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        block_cls = BasicTransformerBlock
        if self.remat:
            block_cls = nn.remat(
                BasicTransformerBlock,
                static_argnums=(3,),
                policy=_remat_policy_fn(self.remat_policy),
            )
        for i in range(self.depth):
            x = block_cls(
                self.heads, self.dim_head, self.dropout, name=f"block{i}"
            )(x, context, deterministic)
        x = x.reshape(b, h, w, inner)
        x = conv1x1(c, zero_init=True, name="proj_out")(x)
        return x + x_in


class SpatialTransformer1D(nn.Module):
    """Token-space transformer over an NLC sequence — the reference's 1D
    SpatialTransformer variant for 1D (waveform) latents
    (diff_foley/modules/diffusionmodules/attention.py:218-297): GroupNorm →
    1×1 Conv1d proj_in → BasicTransformerBlocks → 1×1 Conv1d proj_out
    (optionally zero-init, `use_zero_module`) + residual."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    use_zero_module: bool = True

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        b, l, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(inner, (1,), name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout, name=f"block{i}"
            )(x, context, deterministic)
        kernel_init = (
            nn.initializers.zeros if self.use_zero_module
            else nn.initializers.lecun_normal()
        )
        x = nn.Conv(c, (1,), kernel_init=kernel_init, name="proj_out")(x)
        return x + x_in
