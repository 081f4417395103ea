"""Conditioning bridge: CAVP video features → UNet cross-attention tokens.

Behavioural spec: reference `diff_foley/modules/cond_stage/
video_feat_encoder.py:4-18` — Linear(origin_dim→embed_dim) + learned
positional embedding over the (≤ seq_len) token axis.

Shipped operating points: LDM cond (512→768, seq 40, Stage2_LDM.yaml:62-67);
classifier cond (512→512, seq 40, Double_Guidance_Classifier.yaml:54-59).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


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
