"""LatentDiffusion runtime: the glue between VAE latents, conditioning and
the ε-UNet, for both training and sampling.

Behavioural spec: reference `diff_foley/models/diffusion/ddpm.py:434-1542`
(LatentDiffusion) — frozen first stage with scale_factor 0.18215, trainable
conditioning stage, CFG dropout p=0.2 with a zero null-embedding
(ddpm.py:723-729), ε-parameterization L2 loss with per-t lvlb weighting
(ddpm.py:1046-1081), sampler dispatch (ddpm.py:1288-1356).

Everything here is a pure function over explicit parameter pytrees, so the
same code path serves jit'd training steps, pjit sharding, and the scanned
samplers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.cond_encoder import VideoFeatEncoderPosembed
from ..models.unet import UNetConfig, UNetModel, LDM_UNET
from ..models.vae import SD_VAE, AutoencoderKL, VAEConfig
from .guidance import GuidanceSpec, make_guided_eps_fn
from .samplers import (
    ddim_sample,
    dpm_solver_sample,
    p_sample_loop,
    plms_sample,
    progressive_denoising,
)
from .schedule import DiffusionSchedule

Params = Any


@dataclasses.dataclass(frozen=True)
class LDMConfig:
    """Shipped Stage2 operating point (inference/config/Stage2_LDM.yaml)."""

    unet: UNetConfig = LDM_UNET
    vae: VAEConfig = SD_VAE
    cond_origin_dim: int = 512
    cond_embed_dim: int = 768
    cond_seq_len: int = 40
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    scale_factor: float = 0.18215
    cond_drop_prob: float = 0.2  # CFG dropout (ddpm.py:723-729)
    conditioning_key: str = "crossattn"  # {None,'concat','crossattn','hybrid','adm'}


class LatentDiffusion:
    """Stateless module bundle; parameters travel separately.

    params layout: {"unet": ..., "cond": ...}; the frozen VAE params are kept
    apart (they never receive gradients — reference freezes the first stage,
    ddpm.py:679-737).
    """

    def __init__(self, cfg: LDMConfig = LDMConfig()):
        self.cfg = cfg
        self.unet = UNetModel(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.cond_encoder = VideoFeatEncoderPosembed(
            embed_dim=cfg.cond_embed_dim, seq_len=cfg.cond_seq_len
        )
        self.schedule = DiffusionSchedule.create(
            timesteps=cfg.timesteps,
            linear_start=cfg.linear_start,
            linear_end=cfg.linear_end,
        )

    # ---- initialisation ---------------------------------------------------
    def init_params(self, key: jax.Array) -> Dict[str, Params]:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, 16, 64, self.cfg.unet.in_channels))
        ctx = jnp.zeros((1, self.cfg.cond_seq_len, self.cfg.cond_embed_dim))
        feat = jnp.zeros((1, self.cfg.cond_seq_len, self.cfg.cond_origin_dim))
        return {
            "unet": self.unet.init(k1, x, jnp.zeros((1,)), ctx),
            "cond": self.cond_encoder.init(k2, feat),
        }

    def init_vae_params(self, key: jax.Array) -> Params:
        x = jnp.zeros((1, 32, 32, self.cfg.vae.in_channels))
        return self.vae.init(key, x)

    # ---- first stage ------------------------------------------------------
    def encode_first_stage(
        self, vae_params: Params, x: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """x (B,H,W,3 mel-image) → scaled latent (ddpm.py:679-737).

        Samples the posterior when a key is given (training), else mode.
        """
        post = self.vae.apply(vae_params, x, method=lambda m, a: m.encode(a))
        z = post.sample(key) if key is not None else post.mode()
        return self.cfg.scale_factor * z

    def decode_first_stage(self, vae_params: Params, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latent → mel-image (ddpm.py:740-797)."""
        z = z / self.cfg.scale_factor
        return self.vae.apply(vae_params, z, method=lambda m, a: m.decode(a))

    def decode_first_stage_tiled(
        self, vae_params: Params, z: jnp.ndarray, split
    ) -> jnp.ndarray:
        """Big-canvas decode: overlapping ks-tiles through the VAE decoder,
        border-weighted overlap-add (ddpm.py:749-786, patch_distributed_vq).
        `split`: diffusion.tiled.SplitInputParams (vqf = VAE upsampling)."""
        from .tiled import tiled_apply

        z = z / self.cfg.scale_factor
        return tiled_apply(
            lambda tile: self.vae.apply(
                vae_params, tile, method=lambda m, a: m.decode(a)
            ),
            z, split, uf=split.vqf,
        )

    # ---- conditioning -----------------------------------------------------
    def get_learned_conditioning(self, params: Dict, feat: jnp.ndarray) -> jnp.ndarray:
        return self.cond_encoder.apply(params["cond"], feat)

    def apply_model(
        self, params: Dict, x: jnp.ndarray, t: jnp.ndarray, context=None,
        deterministic: bool = True, rngs=None, c_concat=None, y=None,
    ) -> jnp.ndarray:
        """Route conditioning into the UNet (DiffusionWrapper,
        ddpm.py:1545-1571): channel-concat, cross-attention tokens, both
        ('hybrid'), or class labels ('adm')."""
        key = self.cfg.conditioning_key
        if key in ("concat", "hybrid"):
            assert c_concat is not None
            x = jnp.concatenate([x, c_concat], axis=-1)
        if key == "concat":
            context = None
        if key == "adm":
            return self.unet.apply(
                params["unet"], x, t, None, deterministic, y=y, rngs=rngs
            )
        return self.unet.apply(
            params["unet"], x, t, context, deterministic, rngs=rngs
        )

    def apply_model_tiled(
        self, params: Dict, x: jnp.ndarray, t: jnp.ndarray, context, split
    ) -> jnp.ndarray:
        """ε-prediction over a big latent canvas via overlapping ks-tiles
        (ddpm.py:936-1018): every tile sees the same cross-attention context
        (the reference's `cond_list = [cond] * L` default branch), all L·B
        tiles run as ONE batched UNet call, outputs blend with the border
        weighting. `split`: diffusion.tiled.SplitInputParams."""
        from .tiled import tiled_apply

        def fn(tiles):
            n_rep = tiles.shape[0] // x.shape[0]
            ctx = jnp.tile(context, (n_rep, 1, 1))
            tt = jnp.tile(t, (n_rep,))
            return self.unet.apply(params["unet"], tiles, tt, ctx)

        return tiled_apply(fn, x, split, uf=1)

    # ---- training ---------------------------------------------------------
    def p_losses(
        self,
        params: Dict,
        z_start: jnp.ndarray,
        video_feat: jnp.ndarray,
        key: jax.Array,
        deterministic: bool = False,
    ):
        """ε-prediction loss with CFG dropout (ddpm.py:904-913, 1046-1081).

        Returns (loss, metrics-dict).
        """
        b = z_start.shape[0]
        k_t, k_noise, k_drop, k_dropout = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, z_start.shape, z_start.dtype)
        z_noisy = self.schedule.q_sample(z_start, t, noise)

        context = self.get_learned_conditioning(params, video_feat)
        if self.cfg.cond_drop_prob > 0:
            keep = (
                jax.random.uniform(k_drop, (b, 1, 1)) >= self.cfg.cond_drop_prob
            )
            context = jnp.where(keep, context, jnp.zeros_like(context))

        eps_hat = self.apply_model(
            params, z_noisy, t.astype(jnp.float32), context,
            deterministic=deterministic, rngs={"dropout": k_dropout},
        )
        sq = (eps_hat - noise) ** 2
        per_example = sq.reshape(b, -1).mean(axis=1)
        loss_simple = per_example.mean()
        lvlb = (self.schedule.lvlb_weights[t] * per_example).mean()
        # l_simple_weight=1, learn_logvar=False, original_elbo_weight=0
        loss = loss_simple
        return loss, {"loss_simple": loss_simple, "loss_vlb": lvlb, "t_mean": t.mean()}

    # ---- sampling ---------------------------------------------------------
    def sample(
        self,
        params: Dict,
        video_feat: jnp.ndarray,
        key: jax.Array,
        *,
        latent_hw=(16, 64),
        sampler: str = "dpm",
        steps: int = 25,
        cfg_scale: float = 4.5,
        classifier=None,  # (apply_fn, params) or None
        classifier_scale: float = 0.0,
        x_T: Optional[jnp.ndarray] = None,
        **solver_kwargs,
    ) -> jnp.ndarray:
        """Sample latents conditioned on CAVP features.

        Mirrors sample_log_diff_sampler / sample_log_with_classifier_diff_sampler
        (ddpm.py:1288-1356): zeros null-embedding for CFG, DPM-Solver++ 2M
        default at 25 steps, optional alignment-classifier double guidance.

        sampler='ancestral' runs the full-chain DDPM posterior loop
        (p_sample_loop, ddpm.py:1205-1253); 'ddim' and 'ancestral' both
        accept the reference latent-surface kwargs (mask/x0 inpainting,
        noise_dropout, score_corrector, timesteps/start_T …) via
        **solver_kwargs.
        """
        b = video_feat.shape[0]
        context = self.get_learned_conditioning(params, video_feat)
        # null embedding is zeros in *embedding* space (notebook cell 13 and
        # the training-time CFG dropout, ddpm.py:723-729)
        uncond = jnp.zeros_like(context)

        classifier_fn = None
        classifier_cond = None
        if classifier is not None:
            # (backbone_apply, backbone_params). The classifier context is the
            # RAW 512-d CAVP features, NOT the Posembed-encoded ones: the
            # reference's shipped guidance path calls the classifier's forward
            # (alignment_classifier.py:285-287) with origin_cond straight from
            # the notebook (dpm_solver.py:1388 via sampler.py:145), skipping
            # cond_model even though training encodes (ibid.:234-235). The
            # encoder is used only by classifier training and align-acc.
            clf_apply, clf_params = classifier[:2]
            classifier_cond = video_feat

            def classifier_fn(x, t_model, feat_ctx):
                # log-space: log_sigmoid(logits) stays finite where
                # log(sigmoid(logits)) underflows to log(0) (guidance.py)
                logits = clf_apply(
                    clf_params, x, t_model, feat_ctx, return_logits=True
                )
                return jax.nn.log_sigmoid(logits)

        spec = GuidanceSpec(cfg_scale=cfg_scale, classifier_scale=classifier_scale)
        # model_type (solver library surface, dpm only): the raw-output→ε
        # conversion must happen INSIDE the guided fn, before the classifier
        # term (reference order, dpm_solver.py:335-348) — popping it here
        # hands the solver a plain ε-model so it never converts twice.
        model_type = (
            solver_kwargs.pop("model_type", "noise")
            if sampler == "dpm" else "noise"
        )
        eps_fn = make_guided_eps_fn(
            lambda x, t, c: self.apply_model(params, x, t, c),
            context, uncond, spec, classifier_fn, classifier_cond,
            model_type=model_type,
        )

        k_init, k_samp = jax.random.split(key)
        if x_T is None:
            x_T = jax.random.normal(
                k_init, (b, *latent_hw, self.cfg.unet.in_channels)
            )
        if sampler == "dpm":
            # solver_kwargs expose the full DPM-Solver library (order, method,
            # skip_type, solver_type, thresholding, adaptive tolerances, …);
            # defaults are the shipped operating point (sampler.py:83,154)
            return dpm_solver_sample(
                eps_fn, self.schedule, x_T, steps=steps, **solver_kwargs
            )
        if sampler == "ddim":
            return ddim_sample(
                eps_fn, self.schedule, x_T, k_samp, steps=steps, **solver_kwargs
            )
        if sampler in ("ancestral", "ddpm"):
            # full-chain ancestral sampling (p_sample_loop); `steps` is the
            # DDIM/DPM NFE budget and does not apply here — chain length is
            # schedule.num_timesteps unless timesteps/start_T truncate it
            return p_sample_loop(
                eps_fn, self.schedule, x_T, k_samp, **solver_kwargs
            )
        if sampler == "progressive":
            # progressive denoising (ddpm.py:1146-1203): returns
            # (latents, per-log-step x0 predictions)
            return progressive_denoising(
                eps_fn, self.schedule, x_T, k_samp, **solver_kwargs
            )
        if sampler == "plms":
            if solver_kwargs:
                # fail loudly: PLMS takes no solver options — silently
                # dropping e.g. order=3 would misreport what was sampled
                raise TypeError(
                    f"plms accepts no solver options, got {sorted(solver_kwargs)}"
                )
            return plms_sample(eps_fn, self.schedule, x_T, steps=steps)
        raise ValueError(f"unknown sampler '{sampler}'")
