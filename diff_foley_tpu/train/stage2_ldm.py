"""Stage-2 LDM trainer: data-parallel AdamW training of UNet + cond encoder.

Behavioural spec: reference `training/stage2_ldm/main.py` + ddpm training path
(SURVEY.md §3.2): frozen VAE encode (posterior sample ×0.18215), CFG dropout,
ε-L2 loss, AdamW over UNet+cond params (ddpm.py:1512-1533), LambdaLinear
warmup (diff_foley_train.yaml:21-28), optional EMA.

TPU-native shape: one jit'd train step over a `data`-axis mesh; gradients are
averaged by XLA-inserted psums (replacing Lightning DDP/NCCL allreduce).
Inputs arrive as already-sharded global arrays (parallel.shard_batch).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from ..utils.ema import EmaState, ema_init, ema_update
from ..utils.lr_schedules import lambda_linear


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: Optional[EmaState]


@dataclasses.dataclass(frozen=True)
class Stage2TrainConfig:
    base_lr: float = 1e-4           # launch.sh --scale_lr False
    warmup_steps: int = 1000
    use_ema: bool = False           # Stage2_LDM.yaml:18
    ema_decay: float = 0.9999
    grad_clip: Optional[float] = None
    weight_decay: float = 0.01      # torch AdamW default
    accum_steps: int = 1            # reference --accum-freq equivalent
    mu_dtype: Optional[str] = None  # "bfloat16" halves Adam first-moment HBM
    compute_dtype: Optional[str] = None  # "bfloat16" = mixed precision:
    # fp32 master params/grads/optimizer, bf16 forward+backward compute
    # (params cast to bf16 inside the loss; norms stay fp32 via GroupNorm32)


def make_optimizer(cfg: Stage2TrainConfig) -> optax.GradientTransformation:
    sched = lambda_linear(cfg.base_lr, cfg.warmup_steps)
    tx = optax.adamw(
        learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay, mu_dtype=cfg.mu_dtype,
    )
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def init_train_state(
    ldm: LatentDiffusion, key: jax.Array, cfg: Stage2TrainConfig
) -> TrainState:
    params = ldm.init_params(key)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_init(params) if cfg.use_ema else None,
    )


def make_train_step(
    ldm: LatentDiffusion, cfg: Stage2TrainConfig, tx: Optional[optax.GradientTransformation] = None
):
    """Returns step(state, vae_params, batch, rng) → (state, metrics).

    batch: {"spec": (B,128,512,3) mel-image NHWC in [0,1],
            "video_feat": (B,T,512)}  (adm/data/video_spec_dataset.py keys
            'mix_spec'/'mix_video_feat', channel-tiled ×3; the shipped
            8.192-s crop gives T=32 cond tokens — the pos-emb encoder
            accepts any T ≤ its seq_len).
    """
    tx = tx or make_optimizer(cfg)

    mixed = cfg.compute_dtype == "bfloat16"
    if mixed and ldm.cfg.unet.dtype != "bfloat16":
        # flax Conv/Dense without an explicit dtype promote bf16 activations
        # back up to the fp32 param dtype, so a bf16 compute path needs BOTH
        # a bf16 model config and bf16-cast param leaves at apply time
        ldm = LatentDiffusion(
            dataclasses.replace(
                ldm.cfg,
                unet=dataclasses.replace(ldm.cfg.unet, dtype="bfloat16"),
            )
        )

    def loss_fn(params, vae_params, batch, rng):
        k_enc, k_loss = jax.random.split(rng)
        if "z_mu" in batch:
            # pre-encoded posterior moments (see train/classifier.py): the
            # frozen first stage makes encode a per-item constant; drawing
            # z = mu + sigma*eps here is the same posterior sample the spec
            # path takes, without the per-step VAE forward
            eps = jax.random.normal(k_enc, batch["z_mu"].shape)
            z = ldm.cfg.scale_factor * (batch["z_mu"] + batch["z_sigma"] * eps)
            if mixed:
                from ..utils.precision import cast_floating

                params = cast_floating(params)
                z = z.astype(jnp.bfloat16)
            z = jax.lax.stop_gradient(z)
            loss, metrics = ldm.p_losses(params, z, batch["video_feat"], k_loss)
            return loss, metrics
        spec = batch["spec"]
        if spec.ndim == 3:
            # host sent single-channel mel (tile_channels=False): the ×3
            # channel tiling (video_spec_dataset.py:184) happens on device,
            # cutting host→HBM transfer bytes 3×
            spec = jnp.repeat(spec[..., None], 3, axis=-1)
        if mixed:
            from ..utils.precision import cast_floating

            # bf16 compute against fp32 masters: the cast is differentiable,
            # so grads land back on the fp32 leaves (loss itself is fp32 —
            # the UNet returns fp32 and p_losses reduces in fp32)
            params = cast_floating(params)
            vae_params = cast_floating(vae_params)
            spec = spec.astype(jnp.bfloat16)
        z = ldm.encode_first_stage(vae_params, spec, key=k_enc)
        z = jax.lax.stop_gradient(z)  # frozen first stage (ddpm.py:679)
        loss, metrics = ldm.p_losses(params, z, batch["video_feat"], k_loss)
        return loss, metrics

    def eval_step(state: TrainState, vae_params, batch, rng):
        """Validation loss (val/loss_simple; with EMA params when enabled —
        the reference's monitored val/loss_simple_ema, diff_foley_train.yaml:16)."""
        params = state.ema.params if state.ema is not None else state.params
        loss, metrics = loss_fn(params, vae_params, batch, rng)
        return metrics

    def step(state: TrainState, vae_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, vae_params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if state.ema is not None:
            new_ema = ema_update(state.ema, params, cfg.ema_decay)
            if cfg.accum_steps > 1:
                # one EMA step per OPTIMIZER update, not per micro-step:
                # MultiSteps only applies params every K-th call (mini_step
                # wraps to 0 then); blending the unchanged params K times
                # would effectively raise decay to d^K and end the warmup
                # counter K× early
                did_update = opt_state.mini_step == 0
                ema = jax.tree.map(
                    lambda new, old: jnp.where(did_update, new, old),
                    new_ema, state.ema,
                )
            else:
                ema = new_ema
        else:
            ema = None
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    step.eval_step = eval_step
    return step
