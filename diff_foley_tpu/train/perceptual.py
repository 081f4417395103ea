"""Learned perceptual metrics: LPIPS (VGG16) and LPAPS (VGGishish).

Behavioural spec:
- LPIPS: reference `adm/modules/losses/taming/lpips.py:54-116` — scaling
  layer (fixed RGB shift/scale), VGG16 feature slices (relu1_2, relu2_2,
  relu3_3, relu4_3, relu5_3), per-slice unit-normalise → squared diff →
  1×1-conv linear head → spatial mean, summed over slices.
- LPAPS: `adm/modules/losses/lpaps.py:21-113` — same structure with a
  1-channel VGGishish trunk (VGG16 conv plan, no BN,
  `adm/modules/perceptual/model.py:5-54`) and per-frequency mel statistics
  in the scaling layer.

Pretrained weights cannot be downloaded in this environment; the
architectures are exact and `utils/convert.py::convert_lpips/convert_lpaps`
load the reference checkpoints when available (random-weight parity is
tested side-by-side against the actual torch modules).

Layout: NHWC. Images (B, H, W, 3) in [-1, 1]; spectrograms (B, F, T).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torchvision VGG16 conv plan; 'M' = 2×2/2 max-pool (lpips.py:121-137)
VGG_PLAN: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512)
# capture after the ReLU of these conv indices (relu1_2 … relu5_3)
SLICE_AFTER_CONV = (1, 3, 6, 9, 12)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# ScalingLayer constants (lpips.py:104-107)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGGFeatures(nn.Module):
    """VGG16-style trunk returning the five LPIPS feature slices."""

    plan: Sequence = VGG_PLAN

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        for v in self.plan:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding=1, name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            if conv_i in SLICE_AFTER_CONV:
                feats.append(x)
            conv_i += 1
        return feats


def _unit_normalize(x, eps=1e-10):
    """normalize_tensor (lpips.py:160): unit L2 over channels."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Image perceptual distance. Input (B, H, W, 3) in [-1, 1] → (B,)."""

    @nn.compact
    def __call__(self, x, y):
        shift = self.param(
            "shift", lambda k: jnp.asarray(LPIPS_SHIFT, jnp.float32))
        scale = self.param(
            "scale", lambda k: jnp.asarray(LPIPS_SCALE, jnp.float32))
        net = VGGFeatures(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")
            val = val + head(d).mean(axis=(1, 2))[:, 0]
        return val


class LPAPS(nn.Module):
    """Audio (mel-spectrogram) perceptual distance.

    Input (B, F, T) in [-1, 1] → (B,). `n_freq` sizes the per-frequency
    scaling stats (80 in the reference's 22.05 kHz protocol).
    """

    n_freq: int = 80

    @nn.compact
    def __call__(self, x, y):
        shift = self.param(
            "shift", lambda k: jnp.zeros((self.n_freq,), jnp.float32))
        scale = self.param(
            "scale", lambda k: jnp.ones((self.n_freq,), jnp.float32))
        net = VGGFeatures(name="net")

        def prep(s):  # (B, F, T) → (B, F, T, 1), per-frequency standardised
            s = (s - shift[None, :, None]) / scale[None, :, None]
            return s[..., None]

        fx = net(prep(x))
        fy = net(prep(y))
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")
            val = val + head(d).mean(axis=(1, 2))[:, 0]
        return val


def make_lpips_fn(variables, repeat_gray_to_rgb: bool = True):
    """→ perceptual_fn(x, rec) for the VAE trainer hook
    (decoder_loss.py:72-74 repeats 1-channel specs to RGB)."""
    model = LPIPS()

    def fn(x, rec):
        if repeat_gray_to_rgb and x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
            rec = jnp.repeat(rec, 3, axis=-1)
        return model.apply(variables, x, rec).mean()

    return fn


def make_lpaps_fn(variables, n_freq: int = 80):
    """→ perceptual_fn(spec, rec_spec) over (B, F, T) mel pairs."""
    model = LPAPS(n_freq=n_freq)

    def fn(x, rec):
        if x.ndim == 4:  # (B, F, T, 1) mel-image channel squeeze
            x, rec = x[..., 0], rec[..., 0]
        return model.apply(variables, x, rec).mean()

    return fn
