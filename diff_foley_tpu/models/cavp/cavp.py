"""CAVP dual-tower model (Stage-1): SlowOnly-R50 video / CNN14 audio.

Behavioural spec: reference `open_clip/model.py:457-671` (CLIP_Video_Spec at
the shipped config video_encode='Slowonly_pool', spec_encode='cnn14_pool',
embed_dim=512, `inference/config/Stage1_CAVP.yaml`):

- encode_video: SlowOnly → per-frame 2048 → Linear(2048→512) →
  (optional) MaxPool1d(k=16) over time → (optional) L2 normalise.
- encode_spec: (B, 128 mel, T) → CNN14 → per-timestep 512 →
  (optional) MaxPool1d(k=16) → (optional) L2 normalise.
- learnable logit_scale initialised to ln(1/0.07), clamped to ln(100) by the
  trainer after each step (train_wds_intra_contrast.py:177-178).

The `pool=False` path produces the per-frame (4 FPS) features consumed by the
Stage-2 LDM conditioning (inference/demo_util.py:80-173).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .cnn14 import Cnn14
from .slowonly import ResNet3dSlowOnly


@dataclasses.dataclass(frozen=True)
class CAVPConfig:
    embed_dim: int = 512
    pool_kernel: int = 16
    axis_name: Optional[str] = None  # set to "data" for SyncBN-style stats


def _max_pool_time(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping max over the time axis (torch MaxPool1d(kernel=k))."""
    b, t, c = x.shape
    n = t // k
    return x[:, : n * k].reshape(b, n, k, c).max(axis=2)


def _l2norm(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(1e-12)


class CAVPModel(nn.Module):
    cfg: CAVPConfig = CAVPConfig()

    def setup(self):
        self.video_encoder = ResNet3dSlowOnly(axis_name=self.cfg.axis_name)
        self.video_project_head = nn.Dense(self.cfg.embed_dim)
        self.spec_encoder = Cnn14(
            embed_dim=self.cfg.embed_dim, axis_name=self.cfg.axis_name
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        )

    def encode_video(
        self, video, normalize: bool = False, pool: bool = True,
        train: bool = False,
    ):
        """(B, T, H, W, 3) → (B, 512) pooled or (B, T, 512) per-frame."""
        feat = self.video_encoder(video, train=train)          # (B, T, 2048)
        feat = self.video_project_head(feat)                   # (B, T, 512)
        if pool:
            feat = _max_pool_time(feat, self.cfg.pool_kernel)
            feat = feat.squeeze(1) if feat.shape[1] == 1 else feat
        if normalize:
            feat = _l2norm(feat)
        return feat

    def encode_spec(
        self, spec, normalize: bool = False, pool: bool = True,
        train: bool = False,
    ):
        """(B, n_mels, T) → (B, 512) pooled or (B, T/16, 512) per-step."""
        x = spec.transpose(0, 2, 1)[..., None]                 # (B, T, M, 1)
        feat = self.spec_encoder(x, train=train)               # (B, T/16, 512)
        if pool:
            feat = _max_pool_time(feat, self.cfg.pool_kernel)
            feat = feat.squeeze(1) if feat.shape[1] == 1 else feat
        if normalize:
            feat = _l2norm(feat)
        return feat

    def __call__(self, video, spec, train: bool = False):
        """Contrastive forward: normalized pooled features + logit scale."""
        v = self.encode_video(video, normalize=True, pool=True, train=train)
        s = self.encode_spec(spec, normalize=True, pool=True, train=train)
        return {
            "video_features": v,
            "spec_features": s,
            "logit_scale": jnp.exp(self.logit_scale),
        }
