"""Tiled-latent (fold/unfold) big-canvas processing.

Behavioural spec: reference `diff_foley/models/diffusion/ddpm.py:581-668`
(meshgrid / delta_border / get_weighting / get_fold_unfold) and its two call
sites — `apply_model` (`:936-1018`: unfold the noisy latent into overlapping
ks-patches, run the model per patch, weight by border distance, fold with
overlap-normalisation) and `decode_first_stage` (`:749-786`: same with the
VAE decoder and an `uf=vqf` upsampling factor on the output canvas).

TPU redesign: the reference loops over patches in Python; here all L patches
are stacked into the batch axis and processed in ONE model call (MXU-friendly
large batch), and the fold is an unrolled static scatter-add — the patch grid
is static under jit, so XLA sees a fixed program with no dynamic shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SplitInputParams:
    """split_input_params (ddpm.py:936-947 usage; SD defaults)."""

    ks: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (8, 8)
    vqf: int = 8  # first-stage upsampling factor
    clip_min_weight: float = 0.01
    clip_max_weight: float = 0.5
    tie_braker: bool = True
    clip_min_tie_weight: float = 0.01
    clip_max_tie_weight: float = 0.5


def delta_border(h: int, w: int) -> jnp.ndarray:
    """Normalised distance to the canvas border (ddpm.py:588-600):
    0 at the border, 0.5 at the centre. → (h, w)."""
    y = jnp.arange(h, dtype=jnp.float32)[:, None] / max(h - 1, 1)
    x = jnp.arange(w, dtype=jnp.float32)[None, :] / max(w - 1, 1)
    yy = jnp.broadcast_to(y, (h, w))
    xx = jnp.broadcast_to(x, (h, w))
    up_left = jnp.minimum(yy, xx)
    down_right = jnp.minimum(1.0 - yy, 1.0 - xx)
    return jnp.minimum(up_left, down_right)


def get_weighting(kh: int, kw: int, ly: int, lx: int,
                  p: SplitInputParams) -> jnp.ndarray:
    """Per-patch blending weights (ddpm.py:602-616) → (ly*lx, kh, kw)."""
    w = jnp.clip(delta_border(kh, kw), p.clip_min_weight, p.clip_max_weight)
    w = jnp.broadcast_to(w[None], (ly * lx, kh, kw))
    if p.tie_braker:
        tie = jnp.clip(
            delta_border(ly, lx), p.clip_min_tie_weight, p.clip_max_tie_weight
        ).reshape(ly * lx)
        w = w * tie[:, None, None]
    return w


def _grid(h: int, w: int, ks, stride) -> Tuple[list, int, int]:
    ly = (h - ks[0]) // stride[0] + 1
    lx = (w - ks[1]) // stride[1] + 1
    offsets = [
        (iy * stride[0], ix * stride[1])
        for iy in range(ly) for ix in range(lx)
    ]
    return offsets, ly, lx


def unfold_patches(x: jnp.ndarray, ks, stride) -> jnp.ndarray:
    """NHWC (B, H, W, C) → (L, B, kh, kw, C) overlapping patches
    (torch.nn.Unfold semantics, padding 0 / dilation 1)."""
    offsets, _, _ = _grid(x.shape[1], x.shape[2], ks, stride)
    return jnp.stack(
        [x[:, oy : oy + ks[0], ox : ox + ks[1], :] for oy, ox in offsets]
    )


def fold_patches(patches: jnp.ndarray, out_hw, ks, stride) -> jnp.ndarray:
    """(L, B, kh, kw, C) → (B, H, W, C) overlap-add (torch.nn.Fold)."""
    offsets, _, _ = _grid(out_hw[0], out_hw[1], ks, stride)
    l, b, kh, kw, c = patches.shape
    out = jnp.zeros((b, out_hw[0], out_hw[1], c), patches.dtype)
    for i, (oy, ox) in enumerate(offsets):
        out = out.at[:, oy : oy + kh, ox : ox + kw, :].add(patches[i])
    return out


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    p: SplitInputParams,
    uf: int = 1,
) -> jnp.ndarray:
    """Run `fn` over overlapping ks-tiles of the NHWC canvas `x`, blending
    with the reference's border weighting; `uf` scales the output canvas
    (decode_first_stage's vqf).

    `fn` maps (N, kh, kw, C) → (N, kh·uf, kw·uf, C') and is invoked ONCE on
    all L·B tiles stacked into the batch axis.
    """
    b, h, w, _ = x.shape
    ks, stride = p.ks, p.stride
    # reference clamps kernel/stride to the canvas (ddpm.py:755-761)
    ks = (min(ks[0], h), min(ks[1], w))
    stride = (min(stride[0], h), min(stride[1], w))
    # the patch grid must cover the whole canvas or the uncovered strip gets
    # 0/0 = NaN in the overlap-normalised fold (torch's Unfold silently
    # drops the remainder; shapes are static so fail at trace time instead)
    if (h - ks[0]) % stride[0] != 0 or (w - ks[1]) % stride[1] != 0:
        raise ValueError(
            f"canvas {h}x{w} is not covered by ks={ks}, stride={stride}: "
            "(dim - ks) must be divisible by stride"
        )
    offsets, ly, lx = _grid(h, w, ks, stride)
    L = len(offsets)

    z = unfold_patches(x, ks, stride)                 # (L, B, kh, kw, C)
    zf = z.reshape(L * b, *z.shape[2:])
    of = fn(zf)                                       # (L·B, kh·uf, kw·uf, C')
    o = of.reshape(L, b, *of.shape[1:])

    ks_o = (ks[0] * uf, ks[1] * uf)
    stride_o = (stride[0] * uf, stride[1] * uf)
    weighting = get_weighting(ks_o[0], ks_o[1], ly, lx, p)  # (L, kh', kw')
    o = o * weighting[:, None, :, :, None]
    out_hw = (h * uf, w * uf)
    folded = fold_patches(o, out_hw, ks_o, stride_o)
    ones = jnp.broadcast_to(
        weighting[:, None, :, :, None], (L, 1, ks_o[0], ks_o[1], 1)
    )
    normalization = fold_patches(ones, out_hw, ks_o, stride_o)
    return folded / normalization
