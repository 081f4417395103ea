"""stage2_decode: reconstruct mel-spectrograms from frozen CAVP features.

Behavioural spec: reference `adm/modules/stage2_decode/decode_wrapper.py:37-261`
(Decoder_Wrapper): a frozen first-stage CAVP model encodes the spec to
per-step features z (B, T, C) (`encode_first_stage_spec`, normalize=True,
pool=False); a conv decoder maps z — reshaped to a (B, C, 1, T) canvas —
back to the spec, reshaping the output (B, c, h, t) → (B, c·h, t); trained
either with plain MSE (`shared_step`) or the LPIPSWithDiscriminator GAN loss
(`training_step` optimizer_idx 0/1, configure_optimizers Adam β=(0.5,0.9)).

The reference instantiates the decoder from a config target (no shipped
yaml); here the decoder is the taming-style VAE Decoder over an (B, 1, T, C)
NHWC canvas, sized so mel_bins = out_channels · 2^(len(ch_mult)−1).

TPU notes: the frozen encoder runs under stop_gradient inside the same jit
as the decoder update (one compiled program, no host round trip).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.cavp import CAVPConfig, CAVPModel
from ..models.vae import Decoder, VAEConfig


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Decoder canvas: (B, 1, T, feat_dim) → (B, mel_bins, T·up)."""

    feat_dim: int = 512
    decoder: VAEConfig = VAEConfig(
        ch=64, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=1, out_channels=8
    )
    lr: float = 4.5e-6

    @property
    def mel_bins(self) -> int:
        return self.decoder.out_channels * 2 ** (len(self.decoder.ch_mult) - 1)


class DecodeTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class DecoderWrapper:
    """Frozen CAVP spec tower + trainable spec decoder (MSE objective)."""

    def __init__(self, cfg: DecodeConfig = DecodeConfig(),
                 cavp: Optional[CAVPModel] = None):
        self.cfg = cfg
        self.cavp = cavp or CAVPModel(CAVPConfig())
        self.decoder = Decoder(cfg.decoder)
        self.tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)

    # ---- decoder forward (decode_wrapper.py:153-160) ----------------------
    def reconstruct(self, params, feats: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) features → (B, c·h, t) spec."""
        z = feats[:, None]  # (B, 1, T, C) canvas
        out = self.decoder.apply(params, z)          # (B, h, t, c)
        b, h, t, c = out.shape
        # torch: (B, c, h, t).reshape(B, c*h, t)
        return out.transpose(0, 3, 1, 2).reshape(b, c * h, t)

    def encode_spec(self, cavp_variables, spec: jnp.ndarray) -> jnp.ndarray:
        """Frozen per-step CAVP features (normalize=True, pool=False)."""
        feats = self.cavp.apply(
            cavp_variables, spec,
            method=lambda m, s: m.encode_spec(s, normalize=True, pool=False),
        )
        return jax.lax.stop_gradient(feats)

    # ---- training ---------------------------------------------------------
    def init_train_state(self, key: jax.Array, t_feat: int = 16):
        z = jnp.zeros((1, 1, t_feat, self.cfg.feat_dim))
        params = self.decoder.init(key, z)
        return DecodeTrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    def make_train_step(self):
        def loss_fn(params, feats, spec_target):
            rec = self.reconstruct(params, feats)
            # L2 on the overlapping time extent (shared_step, :145)
            t = min(rec.shape[-1], spec_target.shape[-1])
            loss = jnp.mean((rec[..., :t] - spec_target[..., :t]) ** 2)
            return loss, rec

        def step_fn(state: DecodeTrainState, cavp_variables, spec):
            feats = self.encode_spec(cavp_variables, spec)
            (loss, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, feats, spec
            )
            updates, opt_state = self.tx.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)
            return (
                DecodeTrainState(state.step + 1, params, opt_state),
                {"l2_loss": loss},
            )

        return step_fn


class GANDecodeState(NamedTuple):
    step: jnp.ndarray
    params: Any
    disc_params: Any
    disc_stats: Any
    opt_state: Any
    disc_opt_state: Any


class GANDecoderWrapper(DecoderWrapper):
    """Decoder_Wrapper's GAN training mode (decode_wrapper.py:174-196 +
    configure_optimizers :252-260): the LPIPSWithDiscriminator objective on
    (spec, reconstruction) pairs, two Adam(0.5, 0.9) optimizers.

    `perceptual_fn(x, rec)` (e.g. train.perceptual.make_lpips_fn) supplies
    the perceptual term when loss_cfg.perceptual_weight > 0.
    """

    def __init__(self, cfg: DecodeConfig = DecodeConfig(),
                 cavp: Optional[CAVPModel] = None,
                 loss_cfg=None, perceptual_fn=None):
        from .vae_losses import NLayerDiscriminator, VAELossConfig

        super().__init__(cfg, cavp)
        self.loss_cfg = loss_cfg or VAELossConfig(disc_start=0)
        self.perceptual_fn = perceptual_fn
        self.disc = NLayerDiscriminator()
        self.disc_tx = optax.adam(cfg.lr, b1=0.5, b2=0.9)

    def init_train_state(self, key: jax.Array, t_feat: int = 16,
                         spec_shape=(1, 128, 256)):
        k1, k2 = jax.random.split(key)
        base = super().init_train_state(k1, t_feat)
        dvars = self.disc.init(
            k2, jnp.zeros((spec_shape[0], *spec_shape[1:], 1))
        )
        return GANDecodeState(
            step=base.step,
            params=base.params,
            disc_params=dvars["params"],
            disc_stats=dvars.get("batch_stats", {}),
            opt_state=base.opt_state,
            disc_opt_state=self.disc_tx.init(dvars["params"]),
        )

    def make_gan_train_step(self):
        from .vae_losses import discriminator_loss

        lcfg = self.loss_cfg

        def disc_apply(disc_params, disc_stats, spec_img):
            return self.disc.apply(
                {"params": disc_params, "batch_stats": disc_stats}, spec_img
            )

        def gen_loss_fn(params, disc_params, disc_stats, feats, spec, step):
            rec = self.reconstruct(params, feats)
            t = min(rec.shape[-1], spec.shape[-1])
            rec, spec = rec[..., :t], spec[..., :t]
            rec_loss = jnp.abs(spec - rec)
            if self.perceptual_fn is not None and lcfg.perceptual_weight > 0:
                rec_loss = rec_loss + lcfg.perceptual_weight * (
                    self.perceptual_fn(spec[..., None], rec[..., None])
                )
            nll = jnp.sum(rec_loss) / rec.shape[0]
            logits_fake = disc_apply(disc_params, disc_stats, rec[..., None])
            g_loss = -jnp.mean(logits_fake)
            disc_factor = jnp.where(
                step >= lcfg.disc_start, lcfg.disc_factor, 0.0)
            loss = nll + disc_factor * lcfg.disc_weight * g_loss
            return loss, (rec, {"nll_loss": nll, "g_loss": g_loss})

        def step_fn(state: GANDecodeState, cavp_variables, spec):
            feats = self.encode_spec(cavp_variables, spec)
            (gl, (rec, logs)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(state.params, state.disc_params, state.disc_stats, feats,
              spec, state.step)
            updates, opt_state = self.tx.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)

            def d_loss_fn(disc_params):
                # train=True/mutable so the discriminator's BN statistics
                # update each step (they are persisted into the new state
                # below, matching VAETrainer.disc_loss_fn in train/vae.py)
                t = min(rec.shape[-1], spec.shape[-1])
                lr_, mut = self.disc.apply(
                    {"params": disc_params,
                     "batch_stats": state.disc_stats},
                    spec[..., :t][..., None],
                    train=True, mutable=["batch_stats"],
                )
                lf_, mut = self.disc.apply(
                    {"params": disc_params,
                     "batch_stats": mut["batch_stats"]},
                    jax.lax.stop_gradient(rec)[..., None],
                    train=True, mutable=["batch_stats"],
                )
                return (
                    discriminator_loss(lr_, lf_, state.step, lcfg),
                    mut["batch_stats"],
                )

            (dl, disc_stats), dgrads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.disc_params)
            dupdates, disc_opt_state = self.disc_tx.update(
                dgrads, state.disc_opt_state)
            disc_params = optax.apply_updates(state.disc_params, dupdates)
            logs = dict(logs)
            logs["decode_loss"] = gl
            logs["d_loss"] = dl
            return (
                GANDecodeState(state.step + 1, params, disc_params,
                               disc_stats, opt_state, disc_opt_state),
                logs,
            )

        return step_fn
