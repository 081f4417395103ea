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
    """`video_arch`/`spec_arch` mirror the reference's factory-selectable
    --video_encode/--spec_encode towers (model.py:490-810, params.py:477-491):
    video ∈ {slowonly, x3d, i3d, r2plus1d}, spec ∈ {cnn14, cnn10,
    resnet50, spec_vit, spec_vit_mean}. The shipped Diff-Foley config is
    (slowonly, cnn14)."""

    embed_dim: int = 512
    pool_kernel: int = 16
    video_arch: str = "slowonly"
    spec_arch: str = "cnn14"
    axis_name: Optional[str] = None  # set to "data" for SyncBN-style stats
    dtype: Optional[str] = None  # compute dtype ("bfloat16" for mixed
    # precision); supported on the shipped towers (slowonly/cnn14/cnn10),
    # the alt parity towers stay fp32
    # smoke-config overrides (None = the shipped R50/CNN14 geometry); the
    # stage-2 trainer's --tiny equivalent for CI and the multichip dryrun,
    # where full towers are too slow on emulated CPU meshes
    video_stage_blocks: Optional[tuple] = None   # slowonly only
    video_base_channels: Optional[int] = None    # slowonly only
    spec_channels: Optional[tuple] = None        # cnn14/cnn10 only


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
        cfg = self.cfg
        if cfg.dtype and not (
            cfg.video_arch in ("slowonly",)
            and cfg.spec_arch in ("cnn14", "cnn10")
        ):
            raise ValueError(
                f"dtype={cfg.dtype!r} is only supported for the shipped "
                f"towers (slowonly × cnn14/cnn10), got "
                f"({cfg.video_arch!r}, {cfg.spec_arch!r})"
            )
        dt = jnp.dtype(cfg.dtype) if cfg.dtype else None
        if cfg.video_arch == "slowonly":
            kw = {}
            if cfg.video_stage_blocks is not None:
                kw["stage_blocks"] = tuple(cfg.video_stage_blocks)
            if cfg.video_base_channels is not None:
                kw["base_channels"] = cfg.video_base_channels
            self.video_encoder = ResNet3dSlowOnly(
                axis_name=cfg.axis_name, dtype=cfg.dtype, **kw
            )
            self.video_project_head = nn.Dense(cfg.embed_dim, dtype=dt)
        elif cfg.video_arch == "x3d":
            from .x3d import X3D, X3DConfig

            self.video_encoder = X3D(
                X3DConfig(out_dim=cfg.embed_dim), axis_name=cfg.axis_name
            )
        elif cfg.video_arch == "i3d":
            from .x3d import I3DConfig, I3DResNet

            self.video_encoder = I3DResNet(
                I3DConfig(out_dim=cfg.embed_dim), axis_name=cfg.axis_name
            )
        elif cfg.video_arch == "r2plus1d":
            from .r2plus1d import R2Plus1dConfig, ResNet2Plus1d

            self.video_encoder = ResNet2Plus1d(
                R2Plus1dConfig(out_dim=cfg.embed_dim), axis_name=cfg.axis_name
            )
        elif cfg.video_arch == "vivit":
            # 'mean_vivit_*' towers (model.py:757-775): per-frame tokens →
            # temporal projection head
            from ..vivit import ViViTConfig, ViViTMean

            self.video_encoder = ViViTMean(ViViTConfig())
            self.video_project_head = nn.Dense(cfg.embed_dim)
        else:
            raise ValueError(f"unknown video_arch {cfg.video_arch!r}")

        if cfg.spec_arch == "cnn14":
            self.spec_encoder = Cnn14(
                embed_dim=cfg.embed_dim, axis_name=cfg.axis_name,
                dtype=cfg.dtype, channels=cfg.spec_channels,
            )
        elif cfg.spec_arch == "cnn10":
            from .cnn14 import Cnn10

            # factory: Cnn10(embed_dim=2048) + Linear(2048→embed)
            self.spec_encoder = Cnn10(embed_dim=2048, axis_name=cfg.axis_name,
                                      dtype=cfg.dtype)
            self.spec_project_head = nn.Dense(cfg.embed_dim, dtype=dt)
        elif cfg.spec_arch == "resnet50":
            from .spec_towers import SpecResNet50

            self.spec_encoder = SpecResNet50(axis_name=cfg.axis_name)
            self.spec_project_head = nn.Dense(cfg.embed_dim)
        elif cfg.spec_arch == "spec_vit":
            from .spec_towers import SpecViT

            self.spec_encoder = SpecViT()
            self.spec_project_head = nn.Dense(cfg.embed_dim)
        elif cfg.spec_arch == "spec_vit_mean":
            from .spec_towers import SpecViTMean

            self.spec_encoder = SpecViTMean()
            self.spec_project_head = nn.Dense(cfg.embed_dim)
        else:
            raise ValueError(f"unknown spec_arch {cfg.spec_arch!r}")

        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        )

    def encode_video(
        self, video, normalize: bool = False, pool: bool = True,
        train: bool = False,
    ):
        """(B, T, H, W, 3) → (B, 512) pooled or (B, T, 512) per-frame."""
        if self.cfg.video_arch == "vivit":
            feat = self.video_project_head(self.video_encoder(video))
            if pool:
                feat = feat.mean(axis=1)  # mean_vivit semantics (model.py:873)
            if normalize:
                feat = _l2norm(feat)
            return feat
        feat = self.video_encoder(video, train=train)
        if self.cfg.video_arch == "slowonly":  # (B, T, 2048) → project
            feat = self.video_project_head(feat)
        # x3d / i3d / r2plus1d towers project internally → (B, 16, embed)
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
        """(B, n_mels, T) → (B, 512) pooled or (B, T', 512) per-step."""
        arch = self.cfg.spec_arch
        if arch in ("cnn14", "cnn10"):
            x = spec.transpose(0, 2, 1)[..., None]             # (B, T, M, 1)
            feat = self.spec_encoder(x, train=train)           # (B, T/16, ·)
            if arch == "cnn10":
                feat = self.spec_project_head(feat)
        elif arch == "resnet50":
            x = spec[..., None]                                # (B, M, T, 1)
            feat = self.spec_encoder(x, train=train)           # (B, T', 2048)
            feat = self.spec_project_head(feat)
        elif arch == "spec_vit":
            pooled, tokens = self.spec_encoder(spec)
            feat = self.spec_project_head(pooled if pool else tokens)
            if normalize:
                feat = _l2norm(feat)
            return feat
        else:  # spec_vit_mean: per-token, mean-pooled clip feature
            feat = self.spec_project_head(self.spec_encoder(spec))
            if pool:
                feat = feat.mean(axis=1)
            if normalize:
                feat = _l2norm(feat)
            return feat
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

    def forward_temporal(self, video, spec, train: bool = False):
        """Temporal-variant forward (CLIP_Video_Spec_Temporal,
        model.py:736-960): per-frame AND pooled features for
        train.losses.temporal_semantic_loss.

        ONE tower pass per modality: the reference pools the unnormalized
        temporal features (model.py:856-863,900-907) and then normalizes
        both, which is exactly l2norm(pool(raw)) — no second encoder run.
        """
        vt_raw = self.encode_video(
            video, normalize=False, pool=False, train=train
        )
        if self.cfg.video_arch == "vivit":  # mean_vivit (model.py:871-873)
            v_raw = vt_raw.mean(axis=1)
        else:
            v_raw = _max_pool_time(vt_raw, self.cfg.pool_kernel)
            v_raw = v_raw.squeeze(1) if v_raw.shape[1] == 1 else v_raw

        if self.cfg.spec_arch == "spec_vit":
            # cls-token pooled feature: both outputs come from the one
            # encoder call (model.py:910-913)
            pooled, tokens = self.spec_encoder(spec)
            st_raw = self.spec_project_head(tokens)
            s_raw = self.spec_project_head(pooled)
        else:
            st_raw = self.encode_spec(
                spec, normalize=False, pool=False, train=train
            )
            if self.cfg.spec_arch == "spec_vit_mean":
                s_raw = st_raw.mean(axis=1)
            else:
                s_raw = _max_pool_time(st_raw, self.cfg.pool_kernel)
                s_raw = s_raw.squeeze(1) if s_raw.shape[1] == 1 else s_raw

        return {
            "video_temporal_features": _l2norm(vt_raw),
            "spec_temporal_features": _l2norm(st_raw),
            "video_mean_features": _l2norm(v_raw),
            "spec_mean_features": _l2norm(s_raw),
            "logit_scale": jnp.exp(self.logit_scale),
        }
