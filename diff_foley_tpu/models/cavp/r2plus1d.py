"""R(2+1)D-34 video tower (mmaction lineage), factory-selectable CAVP video
encoder.

Behavioural spec: reference `open_clip/resnet2plus1d.py` — init_R2plus
(`:1260`): ResNet2Plus1d depth 34, conv1_kernel (3,7,7), all temporal strides
1, spatial strides (1,2,2,2), BN eps 1e-3, no pool2; head (added upstream,
`:1222-1223`): AdaptiveAvgPool3d((16,1,1)) → Linear(512, 512) so the tower
emits (B, 16, 512) per-frame features.

Every 3D conv is factorised Conv2plus1d (`:50`): spatial (1,kh,kw) conv →
BN → ReLU → temporal (kt,1,1) conv, with the paper's mid-channel count
M = ⌊3·t·d²·N_{i-1}·N_i / (d²·N_{i-1} + 3·t·N_i)⌋ (arXiv:1711.11248).
mmcv ConvModule wraps each factorised conv with its own BN+ReLU.

Layout: NDHWC; BatchNorm stats in `batch_stats`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .x3d import adaptive_avg_pool_t


def mid_channels_2plus1d(c_in: int, c_out: int, kernel: Tuple[int, int, int]
                         ) -> int:
    """Conv2plus1d mid-plane count (resnet2plus1d.py:98-102)."""
    kt, kh, kw = kernel
    m = 3 * (c_in * c_out * kh * kw)
    m /= c_in * kh * kw + 3 * c_out
    return int(m)


class Conv2Plus1d(nn.Module):
    """Factorised (2+1)D conv: spatial conv → BN → ReLU → temporal conv."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        mid = mid_channels_2plus1d(x.shape[-1], self.features, self.kernel)
        pad_s = ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2))
        x = nn.Conv(mid, (1, kh, kw), strides=(1, sh, sw), padding=pad_s,
                    use_bias=False, name="conv_s")(x)
        # bn_s keeps the BN3d default eps 1e-5: mmcv's build_conv_layer does
        # not forward the backbone norm_cfg into Conv2plus1d
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, name="bn_s",
        )(x)
        x = nn.relu(x)
        pad_t = ((kt // 2, kt // 2), (0, 0), (0, 0))
        return nn.Conv(self.features, (kt, 1, 1), strides=(st, 1, 1),
                       padding=pad_t, use_bias=False, name="conv_t")(x)


class ConvBN2Plus1d(nn.Module):
    """mmcv ConvModule with Conv2plus1d conv_cfg: conv → BN(eps 1e-3) → ReLU."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    act: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2Plus1d(self.features, self.kernel, self.stride,
                        axis_name=self.axis_name, name="conv")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            axis_name=self.axis_name if train else None, name="bn",
        )(x)
        return nn.relu(x) if self.act else x


class BasicBlock2Plus1d(nn.Module):
    """BasicBlock3d with factorised convs (resnet2plus1d.py:244-350)."""

    planes: int
    spatial_stride: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spatial_stride
        out = ConvBN2Plus1d(self.planes, (3, 3, 3), (1, s, s),
                            axis_name=self.axis_name, name="conv1")(x, train)
        out = ConvBN2Plus1d(self.planes, (3, 3, 3), act=False,
                            axis_name=self.axis_name, name="conv2")(out, train)
        if self.has_downsample:
            x = ConvBN2Plus1d(self.planes, (1, 1, 1), (1, s, s), act=False,
                              axis_name=self.axis_name,
                              name="downsample")(x, train)
        return nn.relu(out + x)


@dataclasses.dataclass(frozen=True)
class R2Plus1dConfig:
    stage_blocks: Sequence[int] = (3, 4, 6, 3)  # depth 34
    base_channels: int = 64
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    out_dim: int = 512
    head_frames: int = 16


class ResNet2Plus1d(nn.Module):
    cfg: R2Plus1dConfig = R2Plus1dConfig()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, T, H, W, 3) → (B, head_frames, out_dim)."""
        cfg = self.cfg
        h = ConvBN2Plus1d(cfg.base_channels, (3, 7, 7), (1, 2, 2),
                          axis_name=self.axis_name, name="conv1")(x, train)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="VALID")

        for stage, (blocks, stride) in enumerate(
            zip(cfg.stage_blocks, cfg.spatial_strides), start=1
        ):
            planes = cfg.base_channels * (2 ** (stage - 1))
            for b in range(blocks):
                s = stride if b == 0 else 1
                h = BasicBlock2Plus1d(
                    planes,
                    spatial_stride=s,
                    has_downsample=(b == 0 and (s != 1 or h.shape[-1] != planes)),
                    axis_name=self.axis_name,
                    name=f"layer{stage}_{b}",
                )(h, train)

        h = h.mean(axis=(2, 3))  # (B, T, 512)
        h = adaptive_avg_pool_t(h, cfg.head_frames)
        return nn.Dense(cfg.out_dim, name="project")(h)
