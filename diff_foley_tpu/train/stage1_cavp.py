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


def make_train_step(model: CAVPModel, cfg: Stage1TrainConfig,
                    tx: Optional[optax.GradientTransformation] = None):
    """step(state, batch, rng) → (state, metrics).

    batch: {"video": (B, clip_num, T, H, W, 3), "spec": (B, clip_num, M, Ts)}
    — the intra-contrast layout; flattened to (B·clip_num, …) like the
    reference train loop (:95-99).
    """
    tx = tx or make_optimizer(cfg)

    def loss_fn(params, batch_stats, batch, rng):
        video = batch["video"].reshape(-1, *batch["video"].shape[2:])
        spec = batch["spec"].reshape(-1, *batch["spec"].shape[2:])
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video, spec, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        losses = intra_contrast_loss(
            out["video_features"], out["spec_features"], out["logit_scale"],
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
