"""ViViT factorised space-time video transformer (stage2_decode / temporal
CAVP tower).

Behavioural spec: reference `adm/modules/stage2_decode/vit.py:85-283` (same
file shipped as `open_clip/vit.py`): patch-embed (LayerNorm → Linear →
LayerNorm over (p1 p2 pf c) patches), learned (frame, patch) pos-embedding,
per-frame spatial CLS token → spatial transformer over each frame's tokens →
CLS per frame → temporal transformer (with a temporal CLS in `ViViT`, none
in `ViViT_mean`). ViViT returns (clip_cls (B, dim), per-frame tokens
(B, F, dim)); ViViTMean returns all temporal tokens (B, F, dim).

Operating points (model.py:744-801): base dim 768 / 8+4 depth / 12 heads,
medium 1024 / 12+8 / 16, large 1024 / 24+8 / 16; patch 32 or 16, frames 16,
frame_patch_size 1.

Layout: video (B, T, H, W, 3) NDHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTAttention(nn.Module):
    """lucidrains-style attention: packed qkv (no bias), dim_head·heads inner."""

    dim: int
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * self.dim_head ** -0.5,
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if self.heads == 1 and self.dim_head == self.dim:
            return out
        return nn.Dense(self.dim, name="to_out")(out)


class ViTBlockStack(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"attn{i}_norm")(x)
            x = x + ViTAttention(self.dim, self.heads, self.dim_head,
                                 name=f"attn{i}")(h)
            h = nn.LayerNorm(name=f"ff{i}_norm")(x)
            h = nn.Dense(self.mlp_dim, name=f"ff{i}_in")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.dim, name=f"ff{i}_out")(h)
        return x


@dataclasses.dataclass(frozen=True)
class ViViTConfig:
    """'vivit_base' operating point (model.py:744)."""

    image_size: int = 224
    patch_size: int = 32
    frames: int = 16
    dim: int = 768
    spatial_depth: int = 8
    temporal_depth: int = 4
    heads: int = 12
    mlp_dim: int = 3072
    dim_head: int = 64


class _ViViTBase(nn.Module):
    cfg: ViViTConfig = ViViTConfig()
    temporal_cls: bool = True

    def _embed(self, video):
        cfg = self.cfg
        b, f, hh, ww, c = video.shape
        p = cfg.patch_size
        h, w = hh // p, ww // p
        # 'b c (f pf) (h p1) (w p2) -> b f (h w) (p1 p2 pf c)', pf=1
        x = video.reshape(b, f, h, p, w, p, c)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, h * w, p * p * c)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(cfg.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, f, h * w, cfg.dim),
        )
        return x + pos

    def _space_then_time(self, x):
        cfg = self.cfg
        b, f, n, d = x.shape
        cls_s = self.param(
            "spatial_cls_token", nn.initializers.normal(1.0), (1, 1, d))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_s, (b, f, 1, d)), x], axis=2)
        x = x.reshape(b * f, n + 1, d)
        x = ViTBlockStack(cfg.dim, cfg.spatial_depth, cfg.heads, cfg.mlp_dim,
                          cfg.dim_head, name="spatial_transformer")(x)
        x = x.reshape(b, f, n + 1, d)[:, :, 0]  # per-frame spatial CLS
        if self.temporal_cls:
            cls_t = self.param(
                "temporal_cls_token", nn.initializers.normal(1.0), (1, 1, d))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_t, (b, 1, d)), x], axis=1)
        return ViTBlockStack(cfg.dim, cfg.temporal_depth, cfg.heads,
                             cfg.mlp_dim, cfg.dim_head,
                             name="temporal_transformer")(x)


class ViViT(_ViViTBase):
    """→ (clip_cls (B, dim), per-frame tokens (B, F, dim))."""

    @nn.compact
    def __call__(self, video) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = self._space_then_time(self._embed(video))
        return x[:, 0], x[:, 1:]


class ViViTMean(_ViViTBase):
    """ViViT_mean (vit.py:187): no temporal CLS; all tokens (B, F, dim)."""

    temporal_cls: bool = False

    @nn.compact
    def __call__(self, video) -> jnp.ndarray:
        return self._space_then_time(self._embed(video))
