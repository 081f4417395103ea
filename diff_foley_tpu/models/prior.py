"""Stage-3 diffusion prior: video features → audio (CAVP spec) features.

Behavioural spec: reference `adm/modules/stage3_diffusion/diffprior.py`
(DALLE-2-style prior; experimental subsystem, SURVEY.md §2.4):

- DiffusionPriorNetwork (:249-306): learned null embeddings for video/spec
  CFG masking, learned per-timestep embedding, non-causal Transformer over
  the concatenation [noisy spec | video | time] (3·dim → dim per token).
- DiffusionPrior (:308-…): cosine schedule (250 steps), x0-prediction loss
  with optional L2-norm clamping to √dim, CFG via forward_with_cond_scale.

TPU-native: pre-LN transformer with rotary position embeddings on the
shared attention op; ancestral sampling as one `lax.scan`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention


def _rotary(x: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary position embedding over (B, H, T, D)."""
    b, h, t, d = x.shape
    half = d // 2
    freqs = 1.0 / (10000 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)  # (T, half)
    x1, x2 = x[..., :half], x[..., half : 2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if d % 2:
        rot = jnp.concatenate([rot, x[..., -1:]], axis=-1)
    return rot


class PriorSelfAttention(nn.Module):
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        dh = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(b, t, self.heads, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        q, k = _rotary(q), _rotary(k)
        out = multi_head_attention(q, k, v, scale=dh**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, name="out")(out)


class PriorBlock(nn.Module):
    heads: int = 8
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        x = x + PriorSelfAttention(self.heads, name="attn")(
            nn.LayerNorm(name="norm1")(x)
        )
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(x.shape[-1] * self.mlp_ratio, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(x.shape[-1], name="fc2")(h)


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    dim: int = 512
    seq_len: int = 16          # T (feature tokens per clip)
    depth: int = 6
    heads: int = 8
    num_timesteps: int = 250


class DiffusionPriorNetwork(nn.Module):
    cfg: PriorConfig = PriorConfig()

    @nn.compact
    def __call__(self, spec_noisy, t, video_embed, video_keep, spec_keep):
        """(B,T,D) noisy spec feats + (B,T,D) video feats → (B,T,D) x0 pred.

        video_keep/spec_keep: (B,) bool CFG masks; dropped entries are
        replaced by the learned null embeddings (diffprior.py:272-287).
        """
        cfg = self.cfg
        null_v = self.param("null_video_embeds", nn.initializers.normal(1.0),
                            (1, cfg.seq_len, cfg.dim))
        null_s = self.param("null_spec_embeds", nn.initializers.normal(1.0),
                            (1, cfg.seq_len, cfg.dim))
        video = jnp.where(video_keep[:, None, None], video_embed, null_v)
        spec = jnp.where(spec_keep[:, None, None], spec_noisy, null_s)

        time_embed = nn.Embed(cfg.num_timesteps, cfg.dim, name="time_embed")(
            t.astype(jnp.int32)
        )
        time_tok = jnp.repeat(time_embed[:, None, :], cfg.seq_len, axis=1)

        tokens = jnp.concatenate([spec, video, time_tok], axis=-1)  # (B,T,3D)
        h = nn.Dense(cfg.dim, name="proj_in")(tokens)
        for i in range(cfg.depth):
            h = PriorBlock(cfg.heads, name=f"block{i}")(h)
        h = nn.LayerNorm(name="norm_out")(h)
        return nn.Dense(cfg.dim, name="proj_out")(h)


class DiffusionPrior:
    """x0-prediction diffusion over feature sequences (diffprior.py:308-…)."""

    def __init__(self, cfg: PriorConfig = PriorConfig(),
                 clamp_l2norm: bool = False):
        from ..diffusion.schedule import DiffusionSchedule

        self.cfg = cfg
        self.net = DiffusionPriorNetwork(cfg)
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.num_timesteps, beta_schedule="cosine"
        )
        self.clamp_l2norm = clamp_l2norm
        self.embed_scale = float(np.sqrt(cfg.dim))

    def init_params(self, key: jax.Array):
        b = 1
        z = jnp.zeros((b, self.cfg.seq_len, self.cfg.dim))
        return self.net.init(
            key, z, jnp.zeros((b,)), z, jnp.ones((b,), bool), jnp.ones((b,), bool)
        )

    def _maybe_clamp(self, x):
        if not self.clamp_l2norm:
            return x
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12) * (
            self.embed_scale
        )

    def p_losses(self, params, video_embed, spec_embed, key,
                 video_drop_prob: float = 0.1, spec_drop_prob: float = 0.1):
        """x0-prediction L2 (diffprior.py p_losses)."""
        b = spec_embed.shape[0]
        k_t, k_n, k_v, k_s = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (b,), 0, self.cfg.num_timesteps)
        noise = jax.random.normal(k_n, spec_embed.shape, spec_embed.dtype)
        noisy = self.schedule.q_sample(spec_embed, t, noise)
        video_keep = jax.random.uniform(k_v, (b,)) >= video_drop_prob
        spec_keep = jax.random.uniform(k_s, (b,)) >= spec_drop_prob
        pred = self.net.apply(params, noisy, t.astype(jnp.float32), video_embed,
                              video_keep, spec_keep)
        pred = self._maybe_clamp(pred)
        return jnp.mean((pred - spec_embed) ** 2)

    def sample(self, params, video_embed, key, steps: int = 50,
               cond_scale: float = 1.0):
        """Ancestral sampling with strided timesteps and CFG on x0
        (forward_with_cond_scale + NoiseScheduler p_forward)."""
        cfg = self.cfg
        b = video_embed.shape[0]
        stride = max(cfg.num_timesteps // steps, 1)
        ts = np.arange(0, cfg.num_timesteps, stride)[::-1].copy()
        ts_prev = np.concatenate([ts[1:], [-1]])  # -1 → x0 (ᾱ = 1)

        # generalised posterior q(x_s | x_t, x0) for strided jumps t→s:
        # with α_eff = ᾱ_t/ᾱ_s, coefficients follow the DDPM posterior form.
        ac = np.asarray(self.schedule.alphas_cumprod, np.float64)
        a_t = ac[ts]
        a_s = np.where(ts_prev >= 0, ac[np.maximum(ts_prev, 0)], 1.0)
        alpha_eff = a_t / a_s
        beta_eff = 1.0 - alpha_eff
        coef_x0 = np.sqrt(a_s) * beta_eff / (1.0 - a_t)
        coef_xt = np.sqrt(alpha_eff) * (1.0 - a_s) / (1.0 - a_t)
        var = beta_eff * (1.0 - a_s) / (1.0 - a_t)
        sigma = np.sqrt(np.maximum(var, 0.0))
        sigma[-1] = 0.0  # final jump to x0 is deterministic

        tbl = dict(
            t=jnp.asarray(ts, jnp.float32),
            c0=jnp.asarray(coef_x0, jnp.float32),
            ct=jnp.asarray(coef_xt, jnp.float32),
            sig=jnp.asarray(sigma, jnp.float32),
        )

        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(
            k_init, (b, cfg.seq_len, cfg.dim), video_embed.dtype
        )
        keys = jax.random.split(k_loop, len(ts))
        ones = jnp.ones((b,), bool)
        zeros = jnp.zeros((b,), bool)

        def x0_pred(x, t_vec):
            cond = self.net.apply(params, x, t_vec, video_embed, ones, ones)
            if cond_scale == 1.0:
                return cond
            null = self.net.apply(params, x, t_vec, video_embed, zeros, zeros)
            return null + (cond - null) * cond_scale

        def step(x, per):
            c, k = per
            t_vec = jnp.full((b,), c["t"], jnp.float32)
            x0 = self._maybe_clamp(x0_pred(x, t_vec))
            noise = jax.random.normal(k, x.shape, x.dtype)
            x_new = c["c0"] * x0 + c["ct"] * x + c["sig"] * noise
            # fp32 table scalars must not promote a lower-precision carry
            return x_new.astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, (tbl, keys))
        return x
