"""First-stage VAE trainer: alternating generator/discriminator steps.

Behavioural spec: reference `diff_foley/models/autoencoder.py:341-404`
(AutoencoderKL.training_step with two optimizers) + LPIPSWithDiscriminator.
The adaptive GAN weight ‖∇_last nll‖/‖∇_last g‖ is computed with jax.grad
against the decoder's output-conv kernel (decoder_loss.py:69-77).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.vae import AutoencoderKL, VAEConfig
from .vae_losses import (
    NLayerDiscriminator,
    VAELossConfig,
    discriminator_loss,
    generator_loss,
)


class VAETrainState(NamedTuple):
    step: jnp.ndarray
    params: Any          # VAE params
    disc_params: Any
    disc_stats: Any
    opt_state: Any
    disc_opt_state: Any


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    lr: float = 4.5e-6            # SD first-stage base lr
    loss: VAELossConfig = VAELossConfig()


class VAETrainer:
    def __init__(self, vae: Optional[AutoencoderKL] = None,
                 cfg: VAETrainConfig = VAETrainConfig(),
                 perceptual_fn=None):
        """`perceptual_fn(x, rec) -> scalar` supplies the LPIPS/LPAPS term
        (build with train.perceptual.make_lpips_fn / make_lpaps_fn); active
        when cfg.loss.perceptual_weight > 0 (decoder_loss.py:40-74)."""
        self.vae = vae or AutoencoderKL(VAEConfig())
        self.disc = NLayerDiscriminator()
        self.cfg = cfg
        self.perceptual_fn = perceptual_fn
        self.tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)
        self.disc_tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)

    def init_train_state(self, key: jax.Array, sample_shape=(1, 64, 64, 3)):
        k1, k2 = jax.random.split(key)
        params = self.vae.init(k1, jnp.zeros(sample_shape))
        dvars = self.disc.init(k2, jnp.zeros(sample_shape))
        return VAETrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            disc_params=dvars["params"],
            disc_stats=dvars.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            disc_opt_state=self.disc_tx.init(dvars["params"]),
        )

    def _last_layer_path(self, params):
        return params["params"]["decoder"]["conv_out"]["kernel"]

    def make_train_step(self):
        lcfg = self.cfg.loss

        def gen_loss_fn(params, disc_params, disc_stats, x, key, step):
            rec, posterior = self.vae.apply(
                params, x, key=key, sample_posterior=True
            )
            logits_fake = self.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats}, rec
            )

            # adaptive weight via grads w.r.t. the decoder's last conv kernel
            def nll_of_last(kernel):
                p = jax.tree_util.tree_map(lambda a: a, params)
                p["params"]["decoder"]["conv_out"]["kernel"] = kernel
                r, _ = self.vae.apply(p, x, key=key, sample_posterior=True)
                # same rec term as generator_loss, INCLUDING the perceptual
                # component — the reference's d_weight probes grad(nll) of
                # the full pixel+LPIPS loss (decoder_loss.py:96-104)
                rl = jnp.abs(x - r)
                if self.perceptual_fn is not None and lcfg.perceptual_weight > 0:
                    rl = rl + lcfg.perceptual_weight * self.perceptual_fn(x, r)
                rl = rl / jnp.exp(lcfg.logvar_init)
                return jnp.sum(rl) / x.shape[0]

            def g_of_last(kernel):
                p = jax.tree_util.tree_map(lambda a: a, params)
                p["params"]["decoder"]["conv_out"]["kernel"] = kernel
                r, _ = self.vae.apply(p, x, key=key, sample_posterior=True)
                lf = self.disc.apply(
                    {"params": disc_params, "batch_stats": disc_stats}, r
                )
                return -jnp.mean(lf)

            kernel = self._last_layer_path(params)
            nll_grad = jax.grad(nll_of_last)(kernel)
            g_grad = jax.grad(g_of_last)(kernel)
            d_weight = jnp.linalg.norm(nll_grad) / (
                jnp.linalg.norm(g_grad) + 1e-4
            )
            d_weight = jnp.clip(d_weight, 0.0, 1e4) * lcfg.disc_weight
            d_weight = jax.lax.stop_gradient(d_weight)

            loss, logs = generator_loss(
                rec, x, posterior, logits_fake, step, lcfg, d_weight,
                perceptual_fn=self.perceptual_fn,
            )
            return loss, (logs, rec)

        def disc_loss_fn(disc_params, disc_stats, x, rec, step):
            lr_, mut = self.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            lf, mut = self.disc.apply(
                {"params": disc_params, "batch_stats": mut["batch_stats"]},
                jax.lax.stop_gradient(rec), train=True, mutable=["batch_stats"],
            )
            return discriminator_loss(lr_, lf, step, lcfg), mut["batch_stats"]

        def step_fn(state: VAETrainState, x, rng):
            rng = jax.random.fold_in(rng, state.step)
            (g_loss, (logs, rec)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(state.params, state.disc_params, state.disc_stats, x, rng,
              state.step)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)

            (d_loss, disc_stats), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params, state.disc_stats, x, rec, state.step)
            d_updates, disc_opt_state = self.disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)

            metrics = dict(logs)
            metrics["total_loss"] = g_loss
            metrics["disc_loss"] = d_loss
            return (
                VAETrainState(
                    state.step + 1, params, disc_params, disc_stats,
                    opt_state, disc_opt_state,
                ),
                metrics,
            )

        return step_fn
