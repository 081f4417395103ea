"""Conditioning bridge: CAVP video features → UNet cross-attention tokens.

Behavioural spec: reference `diff_foley/modules/cond_stage/
video_feat_encoder.py:4-18` — Linear(origin_dim→embed_dim) + learned
positional embedding over the (≤ seq_len) token axis.

Shipped operating points: LDM cond (512→768, seq 40, Stage2_LDM.yaml:62-67);
classifier cond (512→512, seq 40, Double_Guidance_Classifier.yaml:54-59).

Also rebuilt here: the training repo's experimental cond-stage variants
(`adm/modules/cond_stage/video_feat_encoder.py:6-127`) — the plain MLP /
single-Linear encoders and the autoregressive `Video_Feat_Encoder_Posembed_AR`
that fuses video tokens with the previous window's spec latent through a
token-sequence cross-attention transformer (`SpatialTransformer_Cond`,
`adm/modules/diffusionmodules/attention_openai.py:265-301`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .attention import BasicTransformerBlock


class VideoFeatEncoderPosembed(nn.Module):
    embed_dim: int = 768
    seq_len: int = 40

    @nn.compact
    def __call__(self, x):
        b, l, _ = x.shape
        x = nn.Dense(self.embed_dim, name="embedder")(x)
        pos = self.param(
            "pos_emb",
            nn.initializers.normal(stddev=1.0),
            (self.seq_len, self.embed_dim),
            jnp.float32,
        )
        return x + pos[None, :l, :].astype(x.dtype)


class VideoFeatEncoderMLP(nn.Module):
    """Video_Feat_Encoder: Linear→ReLU→Linear, no positions
    (adm/modules/cond_stage/video_feat_encoder.py:6-23)."""

    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim, name="embedder_0")(x)
        x = nn.relu(x)
        return nn.Dense(self.embed_dim, name="embedder_2")(x)


class VideoFeatEncoderSimple(nn.Module):
    """Video_Feat_Encoder_simple: a single Linear
    (adm/modules/cond_stage/video_feat_encoder.py:28-39)."""

    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.embed_dim, name="embedder")(x)


class TokenTransformerCond(nn.Module):
    """SpatialTransformer_Cond: pre-LN Linear-projected transformer over a
    (B, L, C) token sequence with optional cross-attention context and an
    outer residual (adm/modules/diffusionmodules/attention_openai.py:265-301).
    The reference builds LayerNorm(inner_dim) and applies it to the
    C-dim input, so it is only runnable when C == heads·dim_head — kept.
    """

    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        x_in = x
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(inner, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout, name=f"block{i}"
            )(x, context, deterministic)
        x = nn.Dense(x_in.shape[-1], name="proj_out")(x)
        return x + x_in


class FusionNet(nn.Module):
    """Cross-attend video tokens over flattened spec-latent tokens, then
    project (adm/modules/cond_stage/video_feat_encoder.py:63-88)."""

    embed_dim: int
    depth: int = 2
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, video_feat, spec_feat, deterministic: bool = True):
        # spec_feat NHWC (B,H,W,C) → (B, H·W, C); matches the reference's
        # permute(0,2,3,1).reshape(bs,-1,c) token order
        b, h, w, c = spec_feat.shape
        tokens = spec_feat.reshape(b, h * w, c)
        fused = TokenTransformerCond(
            self.heads, self.dim_head, self.depth, name="fusion_module"
        )(video_feat, tokens, deterministic)
        return nn.Dense(self.embed_dim, name="proj_out")(fused)


class VideoFeatEncoderPosembedAR(nn.Module):
    """Video_Feat_Encoder_Posembed_AR: embeds video features and the PREVIOUS
    window's spec latent (autoregressive long-audio conditioning), adds
    per-axis learned positions (spec positions indexed by width, broadcast
    over height), fuses via cross-attention
    (adm/modules/cond_stage/video_feat_encoder.py:91-127)."""

    hidden_dim: int = 512
    embed_dim: int = 768
    depth: int = 2
    seq_len: int = 215
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        video_feat, spec_prev_z = batch["video_feat"], batch["spec_prev_z"]
        _, l, _ = video_feat.shape
        _, _, w_spec, _ = spec_prev_z.shape  # NHWC

        v = nn.Dense(self.hidden_dim, name="embed_video_feat")(video_feat)
        s = nn.Conv(self.hidden_dim, (1, 1), name="embed_spec_feat")(
            spec_prev_z
        )
        pos_v = self.param(
            "pos_emb_video", nn.initializers.normal(1.0),
            (self.seq_len, self.hidden_dim), jnp.float32,
        )
        pos_s = self.param(
            "pos_emb_spec", nn.initializers.normal(1.0),
            (self.seq_len, self.hidden_dim), jnp.float32,
        )
        v = v + pos_v[None, :l, :].astype(v.dtype)
        s = s + pos_s[None, None, :w_spec, :].astype(s.dtype)
        return FusionNet(
            self.embed_dim, self.depth, self.heads, self.dim_head,
            name="fusion_net",
        )(v, s, deterministic)
