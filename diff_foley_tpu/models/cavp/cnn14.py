"""PANN CNN14 audio tower (16 kHz variant).

Behavioural spec: reference `open_clip/cnn10.py:297-360` (training) /
`inference/model/cavp_modules.py:1487-1546` — BN over the 128 mel bins,
6 ConvBlocks 64→2048 with (2,2)/(1,2) average pooling (time /16), mean over
the mel axis, max+avg 1D pool fusion (k=3,s=1,p=1), then fc1 applied TWICE
with ReLU (a quirk of the reference forward that the checkpoint weights were
trained with — reproduced deliberately), then final_project to embed_dim.

Layout: input (B, T, n_mels, 1) NHWC; output (B, T/16, embed_dim).
BatchNorm carries running stats in the `batch_stats` collection; pass
`train=True` to update them (optionally with cross-replica stats via
`axis_name="data"`, the reference's --use_bn_sync).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    out_channels: int
    axis_name: Optional[str] = None
    dtype: Optional[str] = None  # compute dtype (BN stats stay fp32)

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), train: bool = False):
        dt = jnp.dtype(self.dtype) if self.dtype else None
        for i in (1, 2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=False, dtype=dt, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if train else None, dtype=dt,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return nn.avg_pool(x, pool_size, strides=pool_size)


class Cnn14(nn.Module):
    embed_dim: int = 512
    dropout: float = 0.2
    axis_name: Optional[str] = None
    dtype: Optional[str] = None
    channels: Optional[tuple] = None  # smoke-config override (6 entries)

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: Optional[bool] = None):
        deterministic = not train if deterministic is None else deterministic
        dt = jnp.dtype(self.dtype) if self.dtype else None
        if dt is not None:
            x = x.astype(dt)
        # bn0 over mel bins: (B,T,M,1) → (B,T,1,M) → BN(feature=M) → back
        b, t, m, _ = x.shape
        h = x.transpose(0, 1, 3, 2)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=dt, name="bn0",
        )(h)
        h = h.transpose(0, 1, 3, 2)

        pools = [(2, 2), (2, 2), (2, 2), (2, 2), (1, 2), (1, 1)]
        chans = list(self.channels) if self.channels else \
            [64, 128, 256, 512, 1024, 2048]
        assert len(chans) == 6, chans
        for i, (c, p) in enumerate(zip(chans, pools), start=1):
            h = ConvBlock(c, self.axis_name, self.dtype,
                          name=f"conv_block{i}")(h, p, train)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h = h.mean(axis=2)  # mean over mel axis → (B, T', 2048)

        # max+avg 1D pooling over time, k=3 s=1 p=1 (fine-grained fusion)
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        mx = jnp.maximum(jnp.maximum(hp[:, :-2], hp[:, 1:-1]), hp[:, 2:])
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        # torch avg_pool1d(count_include_pad=True): edge windows still /3
        av = (hp[:, :-2] + hp[:, 1:-1] + hp[:, 2:]) / 3.0
        h = mx + av

        # width = chans[-1] so the double application type-checks (2048 at
        # the shipped geometry)
        fc1 = nn.Dense(chans[-1], dtype=dt, name="fc1")
        h = nn.relu(fc1(h))
        h = nn.relu(fc1(h))  # double application — reference quirk (see doc)
        return nn.Dense(self.embed_dim, dtype=dt, name="final_project")(h)


class Cnn10(nn.Module):
    """PANN CNN10 audio tower (open_clip/cnn10.py:226-295): 5 ConvBlocks
    64→1024 with (2,2)×4 + (1,2) pooling, same mel-mean + max/avg fusion and
    double-fc1 tail as Cnn14 (factory 'cnn10_pool' uses embed_dim=2048 with
    an external projection head)."""

    embed_dim: int = 2048
    dropout: float = 0.2
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None):
        deterministic = not train if deterministic is None else deterministic
        dt = jnp.dtype(self.dtype) if self.dtype else None
        if dt is not None:
            x = x.astype(dt)
        h = x.transpose(0, 1, 3, 2)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=dt, name="bn0",
        )(h)
        h = h.transpose(0, 1, 3, 2)

        pools = [(2, 2), (2, 2), (2, 2), (2, 2), (1, 2)]
        chans = [64, 128, 256, 512, 1024]
        for i, (c, p) in enumerate(zip(chans, pools), start=1):
            h = ConvBlock(c, self.axis_name, self.dtype,
                          name=f"conv_block{i}")(h, p, train)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h = h.mean(axis=2)  # (B, T/16, 1024)
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        mx = jnp.maximum(jnp.maximum(hp[:, :-2], hp[:, 1:-1]), hp[:, 2:])
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        av = (hp[:, :-2] + hp[:, 1:-1] + hp[:, 2:]) / 3.0
        h = mx + av

        fc1 = nn.Dense(1024, dtype=dt, name="fc1")
        h = nn.relu(fc1(h))
        h = nn.relu(fc1(h))  # double application — reference quirk
        return nn.Dense(self.embed_dim, dtype=dt, name="final_project")(h)
