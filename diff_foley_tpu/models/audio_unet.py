"""1D ε-prediction UNet for waveform/1D-latent diffusion.

Behavioural spec: reference `adm/modules/diffusionmodules/
audio_unetmodel.py:433-1000` — the OpenAI UNet instantiated with dims=1
(all convs Conv1d), cross-attention via the 1D SpatialTransformer
(`diff_foley/modules/diffusionmodules/attention.py:218-297`), and an
optional non-zero-init output projection (`use_zero_module=False`).
Pairs with the Sound_AutoencoderKL 1D latents (models/sound_vae.py).

Layout: NLC (B, L, C).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..diffusion.schedule import timestep_embedding
from .attention import SpatialTransformer1D
from .layers import GroupNorm32, TimestepEmbedMLP, silu


def conv1d(features, kernel=3, stride=1, zero_init=False, name=None):
    return nn.Conv(
        features, (kernel,), strides=(stride,), padding=kernel // 2,
        kernel_init=nn.initializers.zeros if zero_init
        else nn.initializers.lecun_normal(),
        name=name,
    )


class ResBlock1D(nn.Module):
    """Time-conditioned residual block over (B, L, C)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32(name="in_norm")(x)
        h = conv1d(self.out_channels, name="in_conv")(silu(h))
        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            name="emb_dense",
        )(silu(emb))[:, None, :].astype(h.dtype)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = GroupNorm32(name="out_norm")(h + emb_out)
        h = silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv1d(self.out_channels, zero_init=True, name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), name="skip_conv")(x)
        return x + h


@dataclasses.dataclass(frozen=True)
class AudioUNetConfig:
    in_channels: int = 128
    model_channels: int = 192
    out_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (2, 4)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_heads: int = 8
    context_dim: Optional[int] = 768
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_zero_module: bool = True
    transformer_depth: int = 1


class AudioUNetModel(nn.Module):
    """(B, L, C) + t + (B, Lc, context_dim) → (B, L, out_channels)."""

    cfg: AudioUNetConfig = AudioUNetConfig()

    @nn.compact
    def __call__(self, x, timesteps, context=None, deterministic: bool = True):
        cfg = self.cfg
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimestepEmbedMLP(4 * cfg.model_channels, name="time_embed")(t_emb)

        def attn(ch, name):
            return SpatialTransformer1D(
                heads=cfg.num_heads,
                dim_head=ch // cfg.num_heads,
                depth=cfg.transformer_depth,
                dropout=cfg.dropout,
                use_zero_module=cfg.use_zero_module,
                name=name,
            )

        def res(ch, name):
            return ResBlock1D(
                ch, cfg.dropout, cfg.use_scale_shift_norm, name=name)

        hs = []
        h = conv1d(cfg.model_channels, name="in_conv")(x)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = res(ch, f"down_{level}_{i}_res")(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"down_{level}_{i}_attn")(
                        h, context, deterministic)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = conv1d(ch, stride=2, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = res(ch, "mid_res1")(h, emb, deterministic)
        h = attn(ch, "mid_attn")(h, context, deterministic)
        h = res(ch, "mid_res2")(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(ch, f"up_{level}_{i}_res")(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"up_{level}_{i}_attn")(
                        h, context, deterministic)
                if i == cfg.num_res_blocks and level != 0:
                    h = jnp.repeat(h, 2, axis=1)  # nearest ×2
                    h = conv1d(ch, name=f"up_{level}_us")(h)
                    ds //= 2
        assert not hs

        h = GroupNorm32(name="out_norm")(h)
        h = conv1d(
            cfg.out_channels, zero_init=cfg.use_zero_module, name="out_conv"
        )(silu(h))
        return h.astype(jnp.float32)
