"""SlowOnly-R50 3D video tower (mmaction2 lineage).

Behavioural spec: reference `open_clip/audio_contrastive.py:345-1277`
(ResNet3d / ResNet3dPathway / ResNet3dSlowOnly) at depth 50:

- stem: Conv3d(3→64, (1,7,7), stride (1,2,2)) + BN + ReLU,
  MaxPool3d((1,3,3), stride (1,2,2), pad (0,1,1)); temporal dim untouched.
- stages (3,4,6,3) Bottleneck3d blocks, planes (64,128,256,512), spatial
  strides (1,2,2,2), temporal strides all 1, inflate (0,0,1,1): stages 3-4
  use (3,1,1) conv1 kernels ('3x1x1' style), stages 1-2 are pure 2D.
- 'pytorch' style: the spatial stride lives on conv2.
- head: spatial adaptive average pool → (B, T, 2048); T is preserved
  end-to-end (per-frame features at the input FPS — 4 FPS in the pipeline).

Layout: NDHWC (B, T, H, W, C); BatchNorm running stats in `batch_stats`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv3d + BN3d + optional ReLU (mmcv ConvModule equivalent).

    `dtype` is the compute dtype (mixed precision: bf16 activations, BN
    statistics stay fp32 inside flax regardless)."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    act: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype) if self.dtype else None
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride,
            padding=tuple((p, p) for p in self.padding), use_bias=False,
            dtype=dt, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=dt, name="bn",
        )(x)
        return nn.relu(x) if self.act else x


class Bottleneck3d(nn.Module):
    planes: int
    spatial_stride: int = 1
    inflate: bool = False
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.inflate:  # '3x1x1'
            k1, p1 = (3, 1, 1), (1, 0, 0)
        else:
            k1, p1 = (1, 1, 1), (0, 0, 0)
        s = self.spatial_stride
        out = ConvBN(self.planes, k1, (1, 1, 1), p1, axis_name=self.axis_name,
                     dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.planes, (1, 3, 3), (1, s, s), (0, 1, 1),
                     axis_name=self.axis_name, dtype=self.dtype,
                     name="conv2")(out, train)
        out = ConvBN(self.planes * 4, (1, 1, 1), act=False,
                     axis_name=self.axis_name, dtype=self.dtype,
                     name="conv3")(out, train)
        if self.has_downsample:
            x = ConvBN(self.planes * 4, (1, 1, 1), (1, s, s), act=False,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="downsample")(x, train)
        return nn.relu(out + x)


class ResNet3dSlowOnly(nn.Module):
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_channels: int = 64
    spatial_strides: Sequence[int] = (1, 2, 2, 2)
    inflate: Sequence[int] = (0, 0, 1, 1)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, T, H, W, 3) → (B, T, 2048) per-frame features."""
        if self.dtype:
            x = x.astype(jnp.dtype(self.dtype))
        h = ConvBN(self.base_channels, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                   axis_name=self.axis_name, dtype=self.dtype,
                   name="conv1")(x, train)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="VALID")

        for stage, (blocks, stride, infl) in enumerate(
            zip(self.stage_blocks, self.spatial_strides, self.inflate), start=1
        ):
            planes = self.base_channels * (2 ** (stage - 1))
            for b in range(blocks):
                h = Bottleneck3d(
                    planes,
                    spatial_stride=stride if b == 0 else 1,
                    inflate=bool(infl),
                    has_downsample=(b == 0),
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(h, train)

        return h.mean(axis=(2, 3))  # spatial adaptive avg pool → (B, T, C)
