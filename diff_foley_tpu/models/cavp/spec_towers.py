"""Alternate CAVP audio towers: spectrogram ResNet-50 and Spec-ViT.

Behavioural spec: reference `open_clip/audio_contrastive.py` —
- spec_encoder_resnet50 (`:1404`, ResNet `:1344`): 3×3 stem (stride 1), four
  BottleNeck stages all with first-block stride 2, AdaptiveAvgPool2d((1, 4·
  truncate_sec)) over (mel, time) → (B, 2048, T') per-step features.
- Spec_VIT (`:1599`): Conv1d(128→width, k=stride=patch_size) patchify over
  time, CLS token + learned pos-emb, pre-norm CLIP transformer
  (ResidualAttentionBlock `:1507`), ln_post on the CLS token, width→output_dim
  projection matrix; returns (pooled, tokens).
- Spec_VIT_mean (`:1773`): same trunk, no CLS; ln_post + projection applied to
  every token → (B, L, output_dim).

Layout: spec ResNet input (B, mel, T, 1) NHWC; ViT input (B, mel, T).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpecBottleneck(nn.Module):
    """BottleNeck (audio_contrastive.py:1316): 1×1 → 3×3(stride) → 1×1·4."""

    planes: int
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if train else None, name=name,
            )

        s = self.stride
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=(s, s), padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(h)
        h = bn("bn3")(h)
        if x.shape[-1] != self.planes * 4 or s != 1:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(s, s),
                        use_bias=False, name="shortcut_conv")(x)
            x = bn("shortcut_bn")(x)
        return nn.relu(h + x)


@dataclasses.dataclass(frozen=True)
class SpecResNetConfig:
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    truncate_sec: int = 4  # → adaptive pool to 16 time bins (8 → 32)


class SpecResNet50(nn.Module):
    cfg: SpecResNetConfig = SpecResNetConfig()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, mel, T, 1) → (B, T', 2048), T' = 4·truncate_sec."""
        assert self.cfg.truncate_sec in (4, 8)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="stem_conv")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, name="stem_bn",
        )(h)
        h = nn.relu(h)
        for stage, blocks in enumerate(self.cfg.stage_blocks, start=2):
            planes = 64 * (2 ** (stage - 2))
            for b in range(blocks):
                h = SpecBottleneck(
                    planes, stride=2 if b == 0 else 1,
                    axis_name=self.axis_name, name=f"conv{stage}_{b}",
                )(h, train)
        # AdaptiveAvgPool2d((1, t_out)): mel fully averaged, time re-binned
        t_out = 4 * self.cfg.truncate_sec
        b_, m_, t_, c_ = h.shape
        assert t_ % t_out == 0, f"time {t_} not divisible into {t_out} bins"
        h = h.mean(axis=1)  # (B, T, C)
        h = h.reshape(b_, t_out, t_ // t_out, c_).mean(axis=2)
        return h  # (B, T', 2048)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention layout: packed qkv + out projection."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, l, w = x.shape
        qkv = nn.Dense(3 * w, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = w // self.heads

        def heads(t):
            return t.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, w)
        return nn.Dense(w, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="ln_1")(x)
        x = x + MultiheadAttention(self.width, self.heads, name="attn")(h)
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, name="c_proj")(h)


@dataclasses.dataclass(frozen=True)
class SpecViTConfig:
    """Shipped spec_vit operating point (model.py:550)."""

    spec_size: int = 256
    patch_size: int = 16
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    output_dim: int = 512
    cls_token: bool = True


class SpecViT(nn.Module):
    cfg: SpecViTConfig = SpecViTConfig()

    @nn.compact
    def __call__(self, spec):
        """(B, 128 mel, T=spec_size) → (pooled (B, output_dim),
        tokens (B, L, width))  [Spec_VIT forward, :1734]."""
        cfg = self.cfg
        grid = cfg.spec_size // cfg.patch_size
        scale = cfg.width ** -0.5

        x = spec.transpose(0, 2, 1)  # (B, T, mel): Conv1d over time
        x = nn.Conv(cfg.width, (cfg.patch_size,), strides=(cfg.patch_size,),
                    padding="VALID", use_bias=False, name="conv1")(x)

        n_pos = grid + (1 if cfg.cls_token else 0)
        pos = self.param(
            "positional_embedding",
            lambda k: scale * jax.random.normal(k, (n_pos, cfg.width)),
        )
        if cfg.cls_token:
            cls = self.param(
                "class_embedding",
                lambda k: scale * jax.random.normal(k, (cfg.width,)),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (x.shape[0], 1, cfg.width)), x], axis=1
            )
        x = x + pos
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, cfg.mlp_ratio, name=f"block{i}"
            )(x)

        proj = self.param(
            "proj", lambda k: scale * jax.random.normal(
                k, (cfg.width, cfg.output_dim))
        )
        if cfg.cls_token:
            pooled, tokens = x[:, 0], x[:, 1:]
        else:
            pooled, tokens = x.mean(axis=1), x
        pooled = nn.LayerNorm(name="ln_post")(pooled) @ proj
        return pooled, tokens


class SpecViTMean(nn.Module):
    """Spec_VIT_mean (:1773): no CLS, ln_post+proj on every token."""

    cfg: SpecViTConfig = SpecViTConfig(cls_token=False)

    @nn.compact
    def __call__(self, spec):
        cfg = self.cfg
        grid = cfg.spec_size // cfg.patch_size
        scale = cfg.width ** -0.5

        x = spec.transpose(0, 2, 1)
        x = nn.Conv(cfg.width, (cfg.patch_size,), strides=(cfg.patch_size,),
                    padding="VALID", use_bias=False, name="conv1")(x)
        pos = self.param(
            "positional_embedding",
            lambda k: scale * jax.random.normal(k, (grid, cfg.width)),
        )
        x = x + pos
        x = nn.LayerNorm(name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, cfg.mlp_ratio, name=f"block{i}"
            )(x)
        x = nn.LayerNorm(name="ln_post")(x)
        proj = self.param(
            "proj", lambda k: scale * jax.random.normal(
                k, (cfg.width, cfg.output_dim))
        )
        return x @ proj  # (B, L, output_dim)
