"""Stage-1 CAVP trainer: contrastive pretraining of the dual towers.

Behavioural spec: reference `training/main_wds_intra_contrast.py` +
`train_wds_intra_contrast.py` (SURVEY.md §3.3):

- AdamW lr 8e-4, betas (0.9, 0.999), eps 1e-8, wd 0.2 on weights only —
  gains/biases/BN/logit_scale excluded (main_wds_intra_contrast.py:280-295).
- cosine LR with 200-step linear warmup (scheduler.py:13-31).
- per-step: reshape (B, clip_num, …) → (B·clip_num, …), contrastive loss,
  grad step, clamp logit_scale ≤ ln(100) (train loop :95-178).
- BatchNorm running stats updated in train mode; with `axis_name="data"` the
  stats are cross-replica (the --use_bn_sync path).

Data-parallel: same GSPMD pattern as stage-2 — batch sharded over `data`,
params replicated; the contrastive all-gather is implicit in the global
logits matmul (see train/losses.py docstring).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cavp.cavp import CAVPConfig, CAVPModel
from ..utils.lr_schedules import cosine_with_warmup
from .losses import intra_contrast_loss

LOG_100 = float(np.log(100.0))


class CAVPTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class Stage1TrainConfig:
    lr: float = 8e-4
    warmup_steps: int = 200
    total_steps: int = 710_000   # 300 epochs × 567980/(8×30×1) ≈ reference scale
    weight_decay: float = 0.2
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    clip_num: int = 3
    intra_weight: float = 1.0
    grad_clip: Optional[float] = None
    accum_freq: int = 1  # >1 → feature-cache accumulation (see
    #                      make_accum_train_step; reference --accum-freq)
    compute_dtype: Optional[str] = None  # "bfloat16": fp32 masters, bf16
    # tower compute (the reference's open_clip --precision amp, without the
    # GradScaler bf16 doesn't need); the contrastive loss itself and
    # logit_scale stay fp32


def _decay_mask(params):
    """True = apply weight decay. Excludes ndim<2, bn/bias/logit_scale
    (main_wds_intra_contrast.py:280-283)."""

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}".lower()) for k, v in tree.items()}
        is_excluded = (
            getattr(tree, "ndim", 0) < 2
            or "bn" in path
            or "bias" in path
            or "logit_scale" in path
        )
        return not is_excluded

    return walk(params)


def make_optimizer(cfg: Stage1TrainConfig) -> optax.GradientTransformation:
    sched = cosine_with_warmup(cfg.lr, cfg.warmup_steps, cfg.total_steps)
    tx = optax.adamw(
        learning_rate=sched, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
        weight_decay=cfg.weight_decay, mask=_decay_mask,
    )
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def init_train_state(
    model: CAVPModel, key: jax.Array, cfg: Stage1TrainConfig,
    video_shape=(1, 4, 32, 32, 3), spec_shape=(1, 128, 64),
) -> CAVPTrainState:
    variables = model.init(
        key, jnp.zeros(video_shape), jnp.zeros(spec_shape), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return CAVPTrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _maybe_mixed_model(model: CAVPModel, cfg: Stage1TrainConfig) -> CAVPModel:
    """Rebuild the model with bf16 compute dtype under mixed precision
    (flax layers without an explicit dtype would promote bf16 activations
    back up to the fp32 param dtype)."""
    if cfg.compute_dtype == "bfloat16" and model.cfg.dtype != "bfloat16":
        model = CAVPModel(
            dataclasses.replace(model.cfg, dtype="bfloat16")
        )
    return model


def _cast_mixed(params, video, spec):
    """bf16-cast params and inputs inside the loss: differentiable, so
    gradients land on the fp32 masters. logit_scale stays fp32 (its exp and
    post-step clamp run in the loss/trainer, not the towers)."""
    from ..utils.precision import cast_floating

    logit_scale = params["logit_scale"]
    params = dict(cast_floating(params))
    params["logit_scale"] = logit_scale
    return (
        params,
        video.astype(jnp.bfloat16),
        spec.astype(jnp.bfloat16),
    )


def make_train_step(model: CAVPModel, cfg: Stage1TrainConfig,
                    tx: Optional[optax.GradientTransformation] = None):
    """step(state, batch, rng) → (state, metrics).

    batch: {"video": (B, clip_num, T, H, W, 3), "spec": (B, clip_num, M, Ts)}
    — the intra-contrast layout; flattened to (B·clip_num, …) like the
    reference train loop (:95-99).
    """
    tx = tx or make_optimizer(cfg)
    model = _maybe_mixed_model(model, cfg)
    mixed = cfg.compute_dtype == "bfloat16"

    def loss_fn(params, batch_stats, batch, rng):
        video = batch["video"].reshape(-1, *batch["video"].shape[2:])
        spec = batch["spec"].reshape(-1, *batch["spec"].shape[2:])
        if video.dtype == jnp.uint8:
            # uint8-over-the-link data path (CAVPShardConfig.uint8_video):
            # normalize on device in the compute dtype — identical numerics
            # to the host's float /255, at half the transfer bytes of bf16
            video = video.astype(
                jnp.bfloat16 if mixed else jnp.float32) / 255.0
        if mixed:
            params, video, spec = _cast_mixed(params, video, spec)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video, spec, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        # the contrastive loss runs fp32 regardless (the logits matmul is
        # (B,512)² — negligible FLOPs, and the softmax wants the precision)
        losses = intra_contrast_loss(
            out["video_features"].astype(jnp.float32),
            out["spec_features"].astype(jnp.float32),
            out["logit_scale"],
            clip_num=cfg.clip_num, intra_weight=cfg.intra_weight,
        )
        return losses["total_loss"], (losses, mutated["batch_stats"])

    def step(state: CAVPTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # clamp logit_scale to [0, ln(100)] (train_wds_intra_contrast.py:178)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOG_100)
        metrics = {k: v for k, v in losses.items()}
        metrics["logit_scale"] = jnp.exp(params["logit_scale"])
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            CAVPTrainState(state.step + 1, params, new_stats, opt_state),
            metrics,
        )

    return step


def make_accum_train_step(model: CAVPModel, cfg: Stage1TrainConfig,
                          accum_freq: int,
                          tx: Optional[optax.GradientTransformation] = None,
                          train: bool = True):
    """Feature-cache gradient accumulation: the reference's --accum-freq
    (train_wds_intra_contrast.py:115-151).

    step(state, batches, rng) with batches {"video": (K, B, clip_num, …),
    "spec": (K, B, clip_num, …)} holds a K·B-video effective contrastive
    batch on memory that only fits B videos:

    - pass 1: encode all K micro-batches without gradients (features cached;
      BN stats advance here once — the reference's double update in its
      second pass is not reproduced).
    - pass 2: for each j, re-encode micro-batch j WITH gradients, splice its
      live features into the cached set, take the FULL-batch contrastive
      loss, and accumulate grads (lax.scan). The summed tower gradients
      equal the full-batch loss gradient exactly; logit_scale appears live
      in every pass so its summed gradient is divided by K (the reference
      over-counts it K×).

    Note: optax.MultiSteps does NOT reproduce this semantics — each of its
    micro-losses only sees its own negatives.
    """
    tx = tx or make_optimizer(cfg)
    model = _maybe_mixed_model(model, cfg)
    mixed = cfg.compute_dtype == "bfloat16"
    K = accum_freq

    def _flat(mb):
        return mb.reshape(-1, *mb.shape[2:])

    def _encode(params, stats, video, spec, rng):
        if video.dtype == jnp.uint8:  # see make_train_step
            video = video.astype(
                jnp.bfloat16 if mixed else jnp.float32) / 255.0
        if mixed:
            params, video, spec = _cast_mixed(params, video, spec)
        variables = {"params": params, "batch_stats": stats}
        if train:
            out, mutated = model.apply(
                variables, video, spec, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
        else:
            out = model.apply(variables, video, spec, train=False)
            mutated = {"batch_stats": stats}
        # fp32 features: the cached/live splice and the contrastive loss
        # run fp32 under mixed precision
        out = dict(out)
        out["video_features"] = out["video_features"].astype(jnp.float32)
        out["spec_features"] = out["spec_features"].astype(jnp.float32)
        return out, mutated["batch_stats"]

    def step(state: CAVPTrainState, batches, rng):
        rng = jax.random.fold_in(rng, state.step)
        videos = batches["video"]  # (K, B, clip, ...)
        specs = batches["spec"]
        assert videos.shape[0] == K, f"expected {K} micro-batches"

        # ---- pass 1: cache features (no grad), advance BN stats ----------
        def cache_one(stats, xs):
            v, s, key = xs
            out, stats = _encode(state.params, stats, _flat(v), _flat(s), key)
            return stats, (out["video_features"], out["spec_features"])

        keys = jax.random.split(rng, K)
        stats1, (v_cache, s_cache) = jax.lax.scan(
            cache_one, state.batch_stats, (videos, specs, keys)
        )  # caches: (K, b, D)
        v_cache = jax.lax.stop_gradient(v_cache)
        s_cache = jax.lax.stop_gradient(s_cache)
        b = v_cache.shape[1]

        # ---- pass 2: per-micro grads against the full cached batch -------
        def loss_j(params, v_j, s_j, key, j):
            out, _ = _encode(params, stats1, _flat(v_j), _flat(s_j), key)
            v_all = jax.lax.dynamic_update_slice_in_dim(
                v_cache, out["video_features"][None], j, axis=0
            ).reshape(K * b, -1)
            s_all = jax.lax.dynamic_update_slice_in_dim(
                s_cache, out["spec_features"][None], j, axis=0
            ).reshape(K * b, -1)
            losses = intra_contrast_loss(
                v_all, s_all, out["logit_scale"],
                clip_num=cfg.clip_num, intra_weight=cfg.intra_weight,
            )
            return losses["total_loss"], losses

        # K is static: unroll — each iteration is one grad pass over a
        # micro-batch spliced into the cached full batch
        grads_sum = jax.tree.map(jnp.zeros_like, state.params)
        last_losses = None
        for j in range(K):
            (loss, l_j), g = jax.value_and_grad(loss_j, has_aux=True)(
                state.params, videos[j], specs[j], keys[j], j
            )
            grads_sum = jax.tree.map(jnp.add, grads_sum, g)
            last_losses = l_j
        grads = dict(grads_sum)
        grads["logit_scale"] = grads["logit_scale"] / K  # see docstring

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOG_100)
        metrics = {k: v for k, v in last_losses.items()}
        metrics["logit_scale"] = jnp.exp(params["logit_scale"])
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            CAVPTrainState(state.step + 1, params, stats1, opt_state),
            metrics,
        )

    return step
