"""X3D and I3D video towers (PySlowFast lineage), factory-selectable CAVP
video encoders.

Behavioural spec: reference `open_clip/x3d.py` —
- X3D (`x3d.py:1504`, init_X3D `:2165`, x3d-L_config.yaml): X3DStem (spatial
  1×3×3 conv then depthwise temporal 5×1×1, `:744`), four ResStages of
  X3DTransform blocks (1×1×1 → depthwise T×3×3 (+SE on even block idx, swish)
  → 1×1×1, `:510`), head conv→BN→ReLU → avg-pool to (16,1,1) → 1×1×1 expand →
  ReLU → Linear(dim_c5→512) (`:1363`, avg_pool modified upstream to keep
  T=16 so the tower emits per-frame features).
- I3D (`ResNet` `:1862`, init_I3D `:2169`, i3d_config.yaml): 5×7×7 stem +
  (1,3,3) max-pool, bottleneck_transform stages (T×1×1 → 1×3×3 → 1×1×1) with
  the i3d temporal-kernel basis [5],[3],[3,1],[3,1],[1,3] (`x3d.py:16-73`),
  (2,1,1) temporal pool after res2, ResNetBasicHead avg-pool to (16,1,1) →
  Linear(2048→512) (`:1698`).

Widths follow PySlowFast round_width; X3D-L: dim_res{2..5}=(24,48,96,192),
inner ×2.25, depths ceil(5.0·(1,2,5,3)).

Layout: NDHWC (B, T, H, W, C); BatchNorm stats in `batch_stats`.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def round_width(width, multiplier, min_width=1, divisor=1):
    """PySlowFast round_width (x3d.py:1337; defaults min 1 / divisor 1 —
    only the dim_res chain passes divisor=8, SE passes 8/8)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def adaptive_avg_pool_t(x: jnp.ndarray, out_t: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool1d over the leading time axis of (B, T, C).

    Fast paths for the common integer ratios; otherwise the exact torch
    adaptive windows (start=floor(i·T/out), end=ceil((i+1)·T/out)) — T is
    static under trace, so the window loop unrolls to fixed slices."""
    b, t, c = x.shape
    if t == out_t:
        return x
    if t % out_t == 0:
        return x.reshape(b, out_t, t // out_t, c).mean(axis=2)
    if out_t % t == 0:
        return jnp.repeat(x, out_t // t, axis=1)
    outs = []
    for i in range(out_t):
        lo = (i * t) // out_t
        hi = -(-((i + 1) * t) // out_t)  # ceil
        outs.append(x[:, lo:hi].mean(axis=1))
    return jnp.stack(outs, axis=1)


class BNReLU(nn.Module):
    act: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, name="bn",
        )(x)
        return nn.relu(x) if self.act else x


def _conv3d(features, kernel, stride=(1, 1, 1), groups=1, bias=False,
            name=None):
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(
        features, kernel, strides=stride, padding=pad, use_bias=bias,
        feature_group_count=groups, name=name,
    )


class SE(nn.Module):
    """Squeeze-excitation with ReLU inner act (x3d.py:462)."""

    ratio: float = 0.0625

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        dim_fc = round_width(c, self.ratio, min_width=8, divisor=8)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(dim_fc, (1, 1, 1), use_bias=True, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1, 1), use_bias=True, name="fc2")(s)
        return x * nn.sigmoid(s)


class X3DStem(nn.Module):
    features: int
    temp_kernel: int = 5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv3d(self.features, (1, 3, 3), (1, 2, 2), name="conv_xy")(x)
        x = _conv3d(
            self.features, (self.temp_kernel, 1, 1),
            groups=self.features, name="conv",
        )(x)
        return BNReLU(axis_name=self.axis_name, name="norm")(x, train)


class X3DBlock(nn.Module):
    dim_out: int
    dim_inner: int
    stride: int = 1
    temp_kernel: int = 3
    use_se: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        h = _conv3d(self.dim_inner, (1, 1, 1), name="a")(x)
        h = BNReLU(axis_name=self.axis_name, name="a_bn")(h, train)
        h = _conv3d(
            self.dim_inner, (self.temp_kernel, 3, 3), (1, s, s),
            groups=self.dim_inner, name="b",
        )(h)
        h = BNReLU(act=False, axis_name=self.axis_name, name="b_bn")(h, train)
        if self.use_se:
            h = SE(name="se")(h)
        # No inner activation: the reference sets `b_relu = Swish` (a plain
        # function, not an nn.Module) and X3DTransform.forward iterates
        # self.children(), so with swish_inner=True (the default) the swish
        # is never executed (x3d.py:626-649). Parity requires matching that.
        h = _conv3d(self.dim_out, (1, 1, 1), name="c")(h)
        h = BNReLU(act=False, axis_name=self.axis_name, name="c_bn")(h, train)
        if x.shape[-1] != self.dim_out or s != 1:
            x = _conv3d(self.dim_out, (1, 1, 1), (1, s, s), name="branch1")(x)
            x = BNReLU(act=False, axis_name=self.axis_name,
                       name="branch1_bn")(x, train)
        return nn.relu(x + h)


@dataclasses.dataclass(frozen=True)
class X3DConfig:
    """X3D-L operating point (x3d-L_config.yaml + load_config defaults)."""

    dim_c1: int = 12
    width_factor: float = 2.0
    depth_factor: float = 5.0
    bottleneck_factor: float = 2.25
    dim_c5: int = 2048
    out_dim: int = 512
    base_blocks: Sequence[int] = (1, 2, 5, 3)
    head_frames: int = 16  # head avg_pool keeps T=16 (x3d.py:1444)


class X3D(nn.Module):
    cfg: X3DConfig = X3DConfig()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, T, H, W, 3) → (B, head_frames, out_dim) per-frame features."""
        cfg = self.cfg
        dims = [cfg.dim_c1]
        for _ in range(4):  # SCALE_RES2=False: res2 keeps dim_c1
            dims.append(
                round_width(dims[-1], 2.0, divisor=8)
                if len(dims) > 1 else dims[0]
            )
        stage_dims = [round_width(d, cfg.width_factor) for d in dims[1:]]
        dim_res1 = round_width(cfg.dim_c1, cfg.width_factor)

        h = X3DStem(dim_res1, axis_name=self.axis_name, name="s1")(x, train)
        for stage, (base_n, dim_out) in enumerate(
            zip(cfg.base_blocks, stage_dims), start=2
        ):
            dim_inner = int(cfg.bottleneck_factor * dim_out)
            n_rep = int(math.ceil(cfg.depth_factor * base_n))
            for i in range(n_rep):
                h = X3DBlock(
                    dim_out, dim_inner,
                    stride=2 if i == 0 else 1,
                    use_se=(i + 1) % 2 == 1,  # even block idx (x3d.py:624)
                    axis_name=self.axis_name,
                    name=f"s{stage}_b{i}",
                )(h, train)

        dim_inner = int(cfg.bottleneck_factor * stage_dims[-1])
        h = _conv3d(dim_inner, (1, 1, 1), name="conv_5")(h)
        h = BNReLU(axis_name=self.axis_name, name="conv_5_bn")(h, train)
        h = h.mean(axis=(2, 3))  # spatial pool → (B, T, C)
        h = adaptive_avg_pool_t(h, self.cfg.head_frames)
        h = nn.relu(nn.Dense(cfg.dim_c5, use_bias=False, name="lin_5")(h))
        return nn.Dense(cfg.out_dim, name="projection")(h)


class I3DBottleneck(nn.Module):
    dim_out: int
    dim_inner: int
    temp_kernel: int = 3
    stride: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.stride
        h = _conv3d(self.dim_inner, (self.temp_kernel, 1, 1), name="a")(x)
        h = BNReLU(axis_name=self.axis_name, name="a_bn")(h, train)
        h = _conv3d(self.dim_inner, (1, 3, 3), (1, s, s), name="b")(h)
        h = BNReLU(axis_name=self.axis_name, name="b_bn")(h, train)
        h = _conv3d(self.dim_out, (1, 1, 1), name="c")(h)
        h = BNReLU(act=False, axis_name=self.axis_name, name="c_bn")(h, train)
        if x.shape[-1] != self.dim_out or s != 1:
            x = _conv3d(self.dim_out, (1, 1, 1), (1, s, s), name="branch1")(x)
            x = BNReLU(act=False, axis_name=self.axis_name,
                       name="branch1_bn")(x, train)
        return nn.relu(x + h)


# i3d temporal-kernel basis per stage (x3d.py:36-42), cycled across blocks
I3D_TEMP_KERNELS = ((3,), (3, 1), (3, 1), (1, 3))


@dataclasses.dataclass(frozen=True)
class I3DConfig:
    """i3d_config.yaml operating point (ResNet-50 I3D)."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    width_per_group: int = 64
    out_dim: int = 512
    head_frames: int = 16


class I3DResNet(nn.Module):
    cfg: I3DConfig = I3DConfig()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, T, H, W, 3) → (B, head_frames, out_dim)."""
        cfg = self.cfg
        w = cfg.width_per_group
        h = _conv3d(w, (5, 7, 7), (1, 2, 2), name="stem_conv")(x)
        h = BNReLU(axis_name=self.axis_name, name="stem_bn")(h, train)
        h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (1, 3, 3), strides=(1, 2, 2), padding="VALID")

        for stage, blocks in enumerate(cfg.stage_blocks, start=2):
            dim_out = w * 4 * (2 ** (stage - 2))
            dim_inner = w * (2 ** (stage - 2))
            kernels = I3D_TEMP_KERNELS[stage - 2]
            for i in range(blocks):
                h = I3DBottleneck(
                    dim_out, dim_inner,
                    temp_kernel=kernels[i % len(kernels)],
                    stride=(2 if i == 0 and stage > 2 else 1),
                    axis_name=self.axis_name,
                    name=f"s{stage}_b{i}",
                )(h, train)
            # NB: the i3d pathway pool after s2 is commented out in the
            # reference's ResNet.forward (x3d.py:2055-2059) — no temporal
            # pooling happens; parity requires matching that.

        h = h.mean(axis=(2, 3))  # (B, T, 2048)
        h = adaptive_avg_pool_t(h, cfg.head_frames)
        return nn.Dense(cfg.out_dim, name="projection")(h)
