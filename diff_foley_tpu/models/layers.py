"""Shared NN building blocks for the model zoo (flax.linen, NHWC).

Behavioural spec: reference `diff_foley/modules/diffusionmodules/
openai_unetmodel.py` (ResBlock/Upsample/Downsample, GroupNorm32) re-expressed
for TPU: NHWC layout so XLA convs tile directly onto the MXU, fp32 norm
statistics under bf16 compute (GroupNorm32 parity, util.py:214-218), and
`nn.remat` replacing the reference's custom CheckpointFunction.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def silu(x):
    return jax.nn.silu(x)


class _NormParams(nn.Module):
    """scale/bias leaves under the same child-scope names nn.GroupNorm
    would create — lets the Pallas path share one checkpoint tree with the
    XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of activation dtype.

    Mirrors reference GroupNorm32 (util.py:214-218): cast in, normalise,
    cast back. 32 groups, torch-default eps 1e-5 for UNet blocks; the
    VAE/attention `Normalize` uses eps 1e-6.

    `act="silu"` folds the caller's activation into the norm so the fused
    Pallas backend (ops.pallas_groupnorm, enabled via
    set_groupnorm_backend("pallas")) runs stats→normalise→affine→SiLU in a
    single HBM pass; under the default "xla" backend the math and bit
    behaviour are exactly the historical GN-then-silu composition.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_groupnorm import (
            fused_group_norm,
            get_groupnorm_backend,
        )

        if get_groupnorm_backend() != "xla":
            # fused_group_norm picks the per-shape winner: XLA formula for
            # VMEM-resident maps, streaming Pallas pass for HBM-resident
            # ones ("pallas-block" forces the single-block kernel).
            scale, bias = _NormParams(x.shape[-1], name="GroupNorm_0")()
            return fused_group_norm(
                x, scale, bias, self.num_groups, self.epsilon, self.act
            )
        orig_dtype = x.dtype
        h = x.astype(jnp.float32)
        h = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(h)
        h = h.astype(orig_dtype)
        if self.act == "silu":
            h = silu(h)
        return h


def conv3x3(features: int, zero_init: bool = False, name: Optional[str] = None):
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding=((1, 1), (1, 1)),
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


def conv1x1(features: int, zero_init: bool = False, name: Optional[str] = None):
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        name=name,
    )


class TimestepEmbedMLP(nn.Module):
    """model_channels → 4×model_channels SiLU MLP (openai_unetmodel.py:476-481)."""

    embed_dim: int

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.embed_dim, name="dense0")(t_emb)
        x = silu(x)
        return nn.Dense(self.embed_dim, name="dense1")(x)


class Upsample(nn.Module):
    """Nearest ×2 upsample + 3×3 conv (openai_unetmodel.py:91-131)."""

    channels: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = conv3x3(self.channels, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3×3 conv (openai_unetmodel.py:134-160)."""

    channels: int
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(
                self.channels,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """FiLM-style time-conditioned residual block (openai_unetmodel.py:163-275).

    in_layers:  GN32 → SiLU → conv3x3
    emb_layers: SiLU → Dense(out_ch or 2*out_ch)
    out_layers: GN32 → SiLU → dropout → zero-init conv3x3
    skip:       identity or 1×1 conv when channels change
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    # >0 → learned time-axis positional embedding added alongside emb_out
    # (the openai_unetmodel_pos.py:228-283 ResBlock variant; indexes the
    # feature map's W axis, so it must be ≥ the widest level's W)
    pos_seq_len: int = 0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32(name="in_norm", act="silu")(x)
        if self.up:
            h = Upsample(h.shape[-1], use_conv=False)(h)
            x = Upsample(x.shape[-1], use_conv=False)(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = conv3x3(self.out_channels, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            name="emb_dense",
        )(silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = silu(h)
        else:
            h = h + emb_out
            if self.pos_seq_len:
                # shapes are static under trace: fail loudly instead of
                # jax's silent out-of-bounds gather clamp (torch would raise)
                if h.shape[2] > self.pos_seq_len:
                    raise ValueError(
                        f"feature width {h.shape[2]} exceeds pos_seq_len "
                        f"{self.pos_seq_len}"
                    )
                pos = nn.Embed(
                    self.pos_seq_len, self.out_channels, name="pos_emb"
                )(jnp.arange(h.shape[2]))
                h = h + pos[None, None, :, :].astype(h.dtype)
            h = GroupNorm32(name="out_norm", act="silu")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(self.out_channels, zero_init=True, name="out_conv")(h)

        if x.shape[-1] != self.out_channels:
            x = conv1x1(self.out_channels, name="skip_conv")(x)
        return x + h
