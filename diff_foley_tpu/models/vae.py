"""SD first-stage AutoencoderKL (f=8) for mel-spectrogram "images".

Behavioural spec: reference `diff_foley/modules/stage1_autoencoder/model.py`
(taming Encoder/Decoder) + `diff_foley/models/autoencoder.py:269-442`
(AutoencoderKL with 1×1 quant convs and DiagonalGaussian) at the shipped
config (Stage2_LDM.yaml:38-57): ch 128, mult [1,2,4,4], 2 res blocks,
no encoder/decoder attention except the middle block, double_z, z=4.

A 3×128×512 mel window encodes to a 16×64×4 latent (NHWC here).

TPU notes: NHWC; the taming downsample's asymmetric (0,1)×(0,1) pad is kept
for checkpoint parity; mid-block attention uses the shared attention op.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import conv1x1, conv3x3


def _norm(name=None):
    # taming Normalize: GroupNorm(32, eps=1e-6, affine=True)
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


def _gn(x, name, act=None):
    """taming Normalize (+optional SiLU) through the backend-dispatched
    GroupNorm (ops/pallas_groupnorm.py). The default "xla" backend is the
    flax module bit-for-bit; the non-default backends route through
    fused_group_norm, whose measured-winner policy currently also lands on
    the XLA formula (the custom GN kernels lost their A/Bs on the real
    chip -- scripts/gn_microbench.py). Param tree is identical either
    way, so one checkpoint serves all backends."""
    from ..ops.pallas_groupnorm import fused_group_norm, get_groupnorm_backend
    from .layers import _NormParams

    if get_groupnorm_backend() != "xla":
        scale, bias = _NormParams(x.shape[-1], name=name)()
        return fused_group_norm(x, scale, bias, 32, 1e-6, act)
    # stats in fp32 regardless of activation dtype (GroupNorm32 policy,
    # models/layers.py): bf16 variance at eps=1e-6 is too coarse
    h = _norm(name)(x.astype(jnp.float32)).astype(x.dtype)
    return jax.nn.silu(h) if act == "silu" else h


class VAEResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = _gn(x, "norm1", "silu")
        h = conv3x3(self.out_channels, name="conv1")(h)
        h = _gn(h, "norm2", "silu")
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(self.out_channels, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv1x1(self.out_channels, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention over h·w tokens (model.py:245-297)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _gn(x, "norm")
        q = conv1x1(c, name="q")(hn).reshape(b, 1, h * w, c)
        k = conv1x1(c, name="k")(hn).reshape(b, 1, h * w, c)
        v = conv1x1(c, name="v")(hn).reshape(b, 1, h * w, c)
        out = multi_head_attention(q, k, v, scale=c**-0.5)
        out = out.reshape(b, h, w, c)
        return x + conv1x1(c, name="proj_out")(out)


class VAEDownsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # taming: asymmetric pad (0,1,0,1) then VALID stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, kernel_size=(3, 3), strides=(2, 2), padding="VALID",
            name="conv",
        )(x)


class VAEUpsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv3x3(self.channels, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    dropout: float = 0.0


SD_VAE = VAEConfig()


class Encoder(nn.Module):
    cfg: VAEConfig = SD_VAE

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        h = conv3x3(cfg.ch, name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(ch, cfg.dropout, name=f"down_{level}_block{i}")(
                    h, deterministic
                )
            if level != len(cfg.ch_mult) - 1:
                h = VAEDownsample(ch, name=f"down_{level}_ds")(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = VAEResnetBlock(ch, cfg.dropout, name="mid_block1")(h, deterministic)
        h = VAEAttnBlock(name="mid_attn")(h)
        h = VAEResnetBlock(ch, cfg.dropout, name="mid_block2")(h, deterministic)
        h = _gn(h, "norm_out", "silu")
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv3x3(out_ch, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig = SD_VAE

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.cfg
        ch = cfg.ch * cfg.ch_mult[-1]
        h = conv3x3(ch, name="conv_in")(z)
        h = VAEResnetBlock(ch, cfg.dropout, name="mid_block1")(h, deterministic)
        h = VAEAttnBlock(name="mid_attn")(h)
        h = VAEResnetBlock(ch, cfg.dropout, name="mid_block2")(h, deterministic)
        for level, mult in reversed(list(enumerate(cfg.ch_mult))):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, cfg.dropout, name=f"up_{level}_block{i}")(
                    h, deterministic
                )
            if level != 0:
                h = VAEUpsample(ch, name=f"up_{level}_us")(h)
        h = _gn(h, "norm_out", "silu")
        return conv3x3(cfg.out_channels, name="conv_out")(h)


class SimpleDecoder(nn.Module):
    """1×1 conv → 3 ResnetBlocks (2x→4x→2x widths) → 1×1 conv → upsample →
    norm/silu/3×3 out (stage1_autoencoder/model.py:666-699)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.in_channels
        x = conv1x1(c, name="conv0")(x)
        x = VAEResnetBlock(2 * c, name="res1")(x, deterministic)
        x = VAEResnetBlock(4 * c, name="res2")(x, deterministic)
        x = VAEResnetBlock(2 * c, name="res3")(x, deterministic)
        x = conv1x1(c, name="conv4")(x)
        x = VAEUpsample(c, name="upsample")(x)
        h = _gn(x, "norm_out", "silu")
        return conv3x3(self.out_channels, name="conv_out")(h)


class UpsampleDecoder(nn.Module):
    """Per-level (num_res_blocks+1) ResnetBlocks + upsample, then
    norm/silu/3×3 out (model.py:702-747)."""

    out_channels: int
    ch: int
    num_res_blocks: int
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for level, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(
                    ch, self.dropout, name=f"res_{level}_{i}"
                )(h, deterministic)
            if level != len(self.ch_mult) - 1:
                h = VAEUpsample(ch, name=f"up_{level}")(h)
        h = _gn(h, "norm_out", "silu")
        return conv3x3(self.out_channels, name="conv_out")(h)


def _torch_nearest_resize(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='nearest', size=...) index semantics:
    src = floor(dst · in/out) — NHWC."""
    in_h, in_w = x.shape[1], x.shape[2]
    hi = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
    wi = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
    return x[:, hi][:, :, wi]


class LatentRescaler(nn.Module):
    """conv-in → depth ResnetBlocks → nearest-resize by `factor` → attn →
    depth ResnetBlocks → 1×1 conv-out (model.py:750-780)."""

    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = conv3x3(self.mid_channels, name="conv_in")(x)
        for i in range(self.depth):
            x = VAEResnetBlock(self.mid_channels, name=f"res1_{i}")(
                x, deterministic
            )
        x = _torch_nearest_resize(
            x,
            int(round(x.shape[1] * self.factor)),
            int(round(x.shape[2] * self.factor)),
        )
        x = VAEAttnBlock(name="attn")(x)
        for i in range(self.depth):
            x = VAEResnetBlock(self.mid_channels, name=f"res2_{i}")(
                x, deterministic
            )
        return conv1x1(self.out_channels, name="conv_out")(x)


class IdentityFirstStage:
    """Pass-through first stage (models/autoencoder.py:426-441)."""

    def __init__(self, vq_interface: bool = False):
        self.vq_interface = vq_interface

    def encode(self, x, *a, **k):
        return x

    def decode(self, x, *a, **k):
        return x

    def quantize(self, x, *a, **k):
        if self.vq_interface:
            return x, None, [None, None, None]
        return x

    def __call__(self, x, *a, **k):
        return x


class DiagonalGaussian:
    """Posterior N(mean, diag σ²) over latents (models/distribution.py:3-43)."""

    def __init__(self, params: jnp.ndarray):
        self.mean, logvar = jnp.split(params, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other=None) -> jnp.ndarray:
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar,
                axis=tuple(range(1, self.mean.ndim)),
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKL(nn.Module):
    """Frozen first-stage VAE: encode → DiagonalGaussian, decode (autoencoder.py:269-340)."""

    cfg: VAEConfig = SD_VAE

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = conv1x1(2 * self.cfg.embed_dim, name="quant_conv")
        self.post_quant_conv = conv1x1(self.cfg.z_channels, name="post_quant_conv")

    def encode(self, x, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic)
        return DiagonalGaussian(self.quant_conv(h))

    def decode(self, z, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(z), deterministic)

    def __call__(self, x, key=None, sample_posterior: bool = False,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic), posterior
