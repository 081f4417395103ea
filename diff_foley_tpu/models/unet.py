"""The SD-style conditional UNet and the half-UNet alignment classifier.

Behavioural spec: reference `diff_foley/modules/diffusionmodules/
openai_unetmodel.py:443-742` (UNetModel) and `diff_foley/modules/
double_guidance/alignment_backbone.py:417-687` (Classifier_Backbone).

Shipped operating points:
- LDM UNet (inference/config/Stage2_LDM.yaml:21-36): in/out 4ch, 320 base,
  mult [1,2,4,4], 2 res blocks, attention at ds {1,2,4}, 8 heads,
  context 768, transformer_depth 1, legacy False (dim_head = ch // heads).
- Classifier (Double_Guidance_Classifier.yaml:36-51): 128 base, mult [1,2,2],
  1 res block, attention at ds {2,4}, context 512, 1 output logit + sigmoid.

TPU-first: NHWC activations, optional bf16 compute with fp32 norms, remat
on transformer/res blocks instead of the reference's CheckpointFunction,
static python loops (fully unrolled under jit — shapes differ per level so
scan would not apply).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..diffusion.schedule import timestep_embedding
from .attention import SpatialTransformer
from .layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    TimestepEmbedMLP,
    Upsample,
    conv1x1,
    conv3x3,
    silu,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    use_checkpoint: bool = False
    remat_policy: str = "none"  # none | dots | dots_no_batch (training knob)
    num_classes: int = 0  # >0 enables class conditioning (the 'adm' mode)
    pos_seq_len: int = 0  # >0 → ResBlock time-axis pos-emb (the
    #                       openai_unetmodel_pos.py variant)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


LDM_UNET = UNetConfig()
CLASSIFIER_BACKBONE = UNetConfig(
    in_channels=4,
    out_channels=1,
    model_channels=128,
    num_res_blocks=1,
    attention_resolutions=(2, 4),
    channel_mult=(1, 2, 2),
    num_heads=8,
    context_dim=512,
)


class UNetModel(nn.Module):
    """ε-prediction UNet, NHWC in/out: (B, H, W, C) + t + (B, L, context_dim)."""

    cfg: UNetConfig = LDM_UNET

    @nn.compact
    def __call__(self, x, timesteps, context=None, deterministic: bool = True,
                 y=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimestepEmbedMLP(4 * cfg.model_channels, name="time_embed")(t_emb)
        if cfg.num_classes:
            assert y is not None, "class-conditional UNet needs y"
            emb = emb + nn.Embed(
                cfg.num_classes, 4 * cfg.model_channels, name="label_emb"
            )(y)
        emb = emb.astype(dt)
        x = x.astype(dt)
        if context is not None:
            context = context.astype(dt)

        def attn(ch, name):
            return SpatialTransformer(
                heads=cfg.num_heads,
                dim_head=ch // cfg.num_heads,
                depth=cfg.transformer_depth,
                dropout=cfg.dropout,
                remat=cfg.use_checkpoint,
                remat_policy=cfg.remat_policy,
                name=name,
            )

        hs = []
        h = conv3x3(cfg.model_channels, name="in_conv")(x)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.dropout, pos_seq_len=cfg.pos_seq_len,
                             name=f"down_{level}_{i}_res")(
                    h, emb, deterministic
                )
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"down_{level}_{i}_attn")(h, context, deterministic)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = ResBlock(ch, cfg.dropout, pos_seq_len=cfg.pos_seq_len,
                     name="mid_res1")(h, emb, deterministic)
        h = attn(ch, "mid_attn")(h, context, deterministic)
        h = ResBlock(ch, cfg.dropout, pos_seq_len=cfg.pos_seq_len,
                     name="mid_res2")(h, emb, deterministic)

        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, cfg.dropout, pos_seq_len=cfg.pos_seq_len,
                             name=f"up_{level}_{i}_res")(
                    h, emb, deterministic
                )
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"up_{level}_{i}_attn")(h, context, deterministic)
                if i == cfg.num_res_blocks and level != 0:
                    h = Upsample(ch, name=f"up_{level}_us")(h)
                    ds //= 2
        assert not hs

        h = GroupNorm32(name="out_norm", act="silu")(h)
        h = conv3x3(cfg.out_channels, zero_init=True, name="out_conv")(h)
        return h.astype(jnp.float32)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (openai_unetmodel.py AttentionPool2d):
    tokens = [mean | spatial], learned positional embedding, one multi-head
    attention with the mean token as the query, projected to out_dim."""

    num_heads: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import multi_head_attention

        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )
        pos = self.param(
            "pos_emb", nn.initializers.normal(c**-0.5), (h * w + 1, c)
        )
        tokens = tokens + pos[None]
        qkv = nn.Dense(3 * c, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = c // self.num_heads
        split = lambda a: a.reshape(b, -1, self.num_heads, dh).transpose(0, 2, 1, 3)
        out = multi_head_attention(
            split(q[:, :1]), split(k), split(v), scale=dh**-0.5
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return nn.Dense(self.out_dim, name="proj")(out)


class EncoderUNetModel(nn.Module):
    """Generic half-UNet encoder with a pooled head (openai_unetmodel.py:745-959).

    pool: 'adaptive'  — GN→SiLU→global avg→zero 1×1 conv;
          'attention' — GN→SiLU→CLIP-style AttentionPool2d;
          'spatial'   — spatial means of every hidden state concatenated →
                        Dense(2048)→ReLU→Dense(out);
          'spatial_v2' — same with GN32+SiLU between the denses.
    (The shipped classifier uses the dedicated :class:`ClassifierBackbone`;
    this is the guided-diffusion-style generic variant, no cross-attention.)
    """

    cfg: UNetConfig = CLASSIFIER_BACKBONE
    pool: str = "adaptive"

    @nn.compact
    def __call__(self, x, timesteps, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimestepEmbedMLP(4 * cfg.model_channels, name="time_embed")(t_emb)
        emb = emb.astype(dt)
        h = x.astype(dt)

        results = []
        h = conv3x3(cfg.model_channels, name="in_conv")(h)
        if self.pool.startswith("spatial"):
            results.append(h.mean(axis=(1, 2)))
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.dropout, name=f"down_{level}_{i}_res")(
                    h, emb, deterministic
                )
                if ds in cfg.attention_resolutions:
                    h = SpatialTransformer(
                        heads=cfg.num_heads, dim_head=ch // cfg.num_heads,
                        depth=cfg.transformer_depth, name=f"down_{level}_{i}_attn",
                    )(h, None, deterministic)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=(1, 2)))
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"down_{level}_ds")(h)
                if self.pool.startswith("spatial"):
                    results.append(h.mean(axis=(1, 2)))
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = ResBlock(ch, cfg.dropout, name="mid_res1")(h, emb, deterministic)
        h = ResBlock(ch, cfg.dropout, name="mid_res2")(h, emb, deterministic)

        if self.pool.startswith("spatial"):
            results.append(h.mean(axis=(1, 2)).astype(jnp.float32))
            feats = jnp.concatenate(
                [r.astype(jnp.float32) for r in results], axis=-1
            )
            feats = nn.Dense(2048, name="head_fc1")(feats)
            if self.pool == "spatial_v2":
                feats = GroupNorm32(name="head_norm")(feats[:, None, None, :])
                feats = silu(feats)[:, 0, 0, :]
            else:
                feats = nn.relu(feats)
            return nn.Dense(cfg.out_channels, name="head_fc2")(feats)

        h = GroupNorm32(name="out_norm")(h)
        h = silu(h)
        if self.pool == "attention":
            return AttentionPool2d(
                cfg.num_heads, cfg.out_channels, name="attn_pool"
            )(h.astype(jnp.float32))
        # 'adaptive'
        h = h.mean(axis=(1, 2))[:, None, None, :]
        h = conv1x1(cfg.out_channels, zero_init=True, name="out_conv")(h)
        return h[:, 0, 0, :].astype(jnp.float32)


class ClassifierBackbone(nn.Module):
    """Half-UNet alignment classifier: P(audio aligned with video | x_t, t).

    Encoder trunk of :class:`UNetModel` + head:
    GN → SiLU → zero conv(ch→ch/2) → global avg pool → Dense(1) → sigmoid
    (alignment_backbone.py:630-687).
    """

    cfg: UNetConfig = CLASSIFIER_BACKBONE

    @nn.compact
    def __call__(self, x, timesteps, context, deterministic: bool = True,
                 return_logits: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = TimestepEmbedMLP(4 * cfg.model_channels, name="time_embed")(t_emb)
        emb = emb.astype(dt)
        x = x.astype(dt)
        context = context.astype(dt)

        def attn(ch, name):
            return SpatialTransformer(
                heads=cfg.num_heads,
                dim_head=ch // cfg.num_heads,
                depth=cfg.transformer_depth,
                dropout=cfg.dropout,
                remat=cfg.use_checkpoint,
                remat_policy=cfg.remat_policy,
                name=name,
            )

        h = conv3x3(cfg.model_channels, name="in_conv")(x)
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = mult * cfg.model_channels
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.dropout, name=f"down_{level}_{i}_res")(
                    h, emb, deterministic
                )
                if ds in cfg.attention_resolutions:
                    h = attn(ch, f"down_{level}_{i}_attn")(h, context, deterministic)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"down_{level}_ds")(h)
                ds *= 2

        ch = cfg.channel_mult[-1] * cfg.model_channels
        h = ResBlock(ch, cfg.dropout, name="mid_res1")(h, emb, deterministic)
        h = attn(ch, "mid_attn")(h, context, deterministic)
        h = ResBlock(ch, cfg.dropout, name="mid_res2")(h, emb, deterministic)

        h = GroupNorm32(name="out_norm", act="silu")(h)
        h = conv3x3(ch // 2, zero_init=True, name="out_conv")(h)
        h = h.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        h = nn.Dense(cfg.out_channels, name="classifier")(h.astype(jnp.float32))
        # return_logits lets guidance take log_sigmoid(logits) instead of
        # log(sigmoid(...)): the latter is -inf/NaN-grad once the fp32
        # sigmoid underflows to 0 (TPU flushes subnormals)
        return h if return_logits else nn.sigmoid(h)
