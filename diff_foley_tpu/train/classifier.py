"""Alignment-classifier trainer (double-guidance / eval classifier).

Behavioural spec: reference `diff_foley/modules/double_guidance/
alignment_classifier.py:72-294` (Alignment_Classifier_Double_Guidance):
frozen VAE encode ×0.18215 → q_sample noisy latent at t~U[0,1000) →
cond encoder (512→512 Posembed) → half-UNet backbone → sigmoid → BCE against
aligned/misaligned labels; AdamW over backbone+cond (configure_optimizers).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedule import DiffusionSchedule
from ..models.cond_encoder import VideoFeatEncoderPosembed
from ..models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone, UNetConfig
from ..models.vae import AutoencoderKL


class ClassifierTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class ClassifierTrainConfig:
    lr: float = 5e-5                # Double_Guidance_Classifier.yaml:2
    scale_factor: float = 0.18215
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120


class ClassifierTrainer:
    def __init__(
        self,
        backbone_cfg: UNetConfig = CLASSIFIER_BACKBONE,
        vae: Optional[AutoencoderKL] = None,
        cfg: ClassifierTrainConfig = ClassifierTrainConfig(),
        cond_seq_len: int = 40,
    ):
        self.cfg = cfg
        self.backbone = ClassifierBackbone(backbone_cfg)
        self.cond_encoder = VideoFeatEncoderPosembed(
            embed_dim=backbone_cfg.context_dim, seq_len=cond_seq_len
        )
        self.vae = vae or AutoencoderKL()
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps,
            linear_start=cfg.linear_start,
            linear_end=cfg.linear_end,
        )
        # weight_decay=0.01 = torch AdamW default (the reference's
        # configure_optimizers uses stock torch.optim.AdamW); optax's
        # default is 1e-4, a 100x weaker regularisation
        self.tx = optax.adamw(cfg.lr, weight_decay=0.01)

    def init_params(self, key: jax.Array, latent_hw=(16, 64)):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, *latent_hw, 4))
        feat = jnp.zeros((1, self.cond_encoder.seq_len, 512))
        ctx = jnp.zeros((1, self.cond_encoder.seq_len, self.backbone.cfg.context_dim))
        return {
            "backbone": self.backbone.init(k1, x, jnp.zeros((1,)), ctx),
            "cond": self.cond_encoder.init(k2, feat),
        }

    def init_train_state(self, key: jax.Array) -> ClassifierTrainState:
        params = self.init_params(key)
        return ClassifierTrainState(
            jnp.asarray(0, jnp.int32), params, self.tx.init(params)
        )

    def apply(self, params, z_noisy, t, video_feat):
        """P(aligned | z_t, t, video) — the inference-time classifier_fn."""
        ctx = self.cond_encoder.apply(params["cond"], video_feat)
        return self.backbone.apply(params["backbone"], z_noisy, t, ctx)

    def make_train_step(self, vae_params):
        def loss_fn(params, batch, rng):
            k_enc, k_t, k_noise = jax.random.split(rng, 3)
            if "z_mu" in batch:
                # pre-encoded posterior moments: the frozen VAE makes the
                # encode a per-item constant, so callers may cache
                # (mu, sigma) once and draw the SAME posterior sample the
                # spec path would — removes the per-step VAE forward, the
                # hot-loop cost for small backbones (device-resident
                # training, train/scan.py)
                eps = jax.random.normal(k_enc, batch["z_mu"].shape)
                z = batch["z_mu"] + batch["z_sigma"] * eps
            else:
                z = self.vae.apply(
                    vae_params, batch["spec"], method=lambda m, a: m.encode(a)
                ).sample(k_enc)
            z = jax.lax.stop_gradient(self.cfg.scale_factor * z)
            b = z.shape[0]
            t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
            noise = jax.random.normal(k_noise, z.shape, z.dtype)
            z_noisy = self.schedule.q_sample(z, t, noise)
            p = self.apply(params, z_noisy, t.astype(jnp.float32), batch["video_feat"])
            labels = batch["labels"].astype(jnp.float32)[:, None]
            eps = 1e-7
            p = jnp.clip(p, eps, 1 - eps)
            bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)).mean()
            acc = (jnp.round(p) == labels).mean()
            return bce, {"bce_loss": bce, "acc": acc}

        def step(state: ClassifierTrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return ClassifierTrainState(state.step + 1, params, opt_state), metrics

        return step
