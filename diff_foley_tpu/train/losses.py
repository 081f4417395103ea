"""Contrastive losses for Stage-1 CAVP training.

Behavioural spec: reference `open_clip/loss.py`:

- :func:`clip_loss` — standard InfoNCE over the *global* batch
  (ClipLoss, loss.py:21-168).
- :func:`intra_contrast_loss` — the shipped `clip_intra_contrast` objective
  (ClipLoss_Intra_Contrast, loss.py:451-536): batch-wise ("extra") CE over
  the full similarity matrix + intra-video CE over the clip_num×clip_num
  diagonal blocks, weighted sum.
- :func:`temporal_semantic_loss` — ClipLoss_Temporal_Semantic
  (loss.py:171-289): pooled semantic CE + per-frame temporal CE.

TPU note on the reference's `gather_features` (loss.py:21-65): under
jit+GSPMD with the batch sharded over the `data` mesh axis, the full-batch
logits matmul v @ sᵀ *is* the gather — XLA inserts the all-gather, and it is
differentiable by construction (the `--gather-with-grad` semantics, which is
the correctness-preserving variant). No explicit collective is needed; these
are pure global-batch functions.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax


def _ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def clip_loss(
    video_feats: jnp.ndarray,
    spec_feats: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetric InfoNCE over the global batch (loss.py:126-168)."""
    logits_v = logit_scale * video_feats @ spec_feats.T
    labels = jnp.arange(video_feats.shape[0])
    return 0.5 * (_ce(logits_v, labels) + _ce(logits_v.T, labels))


def intra_contrast_loss(
    video_feats: jnp.ndarray,
    spec_feats: jnp.ndarray,
    logit_scale: jnp.ndarray,
    clip_num: int = 3,
    intra_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Extra (batch-wise) + intra-video contrastive CE (loss.py:480-536).

    Inputs are (B·clip_num, D) with the clip_num temporally-shifted windows
    of each video adjacent (the trainer's reshape at
    train_wds_intra_contrast.py:95-99).
    """
    bs = video_feats.shape[0]
    assert bs % clip_num == 0, (bs, clip_num)
    logits_v = logit_scale * video_feats @ spec_feats.T  # (B, B)
    logits_s = logits_v.T
    labels = jnp.arange(bs)
    extra = 0.5 * (_ce(logits_v, labels) + _ce(logits_s, labels))

    nb = bs // clip_num
    diag = jnp.arange(nb)

    def _intra(logits):
        blocks = logits.reshape(nb, clip_num, nb, clip_num)[diag, :, diag, :]
        blocks = blocks.reshape(nb * clip_num, clip_num)
        lab = jnp.tile(jnp.arange(clip_num), nb)
        return _ce(blocks, lab)

    intra = 0.5 * (_intra(logits_v) + _intra(logits_s))
    total = extra + intra_weight * intra
    return {
        "total_loss": total,
        "extra_contrast_loss": extra,
        "intra_contrast_loss": intra,
    }


def temporal_semantic_loss(
    video_feats: jnp.ndarray,
    spec_feats: jnp.ndarray,
    video_temporal: jnp.ndarray,
    spec_temporal: jnp.ndarray,
    logit_scale: jnp.ndarray,
    temporal_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Semantic (pooled) + temporal (per-frame, B×T×T) CE (loss.py:171-289).

    video_temporal/spec_temporal: (B, T, D) per-frame features with matching
    frame rates; diagonal frame alignment is the target.
    """
    semantic = clip_loss(video_feats, spec_feats, logit_scale)

    t = video_temporal.shape[1]
    logits = logit_scale * jnp.einsum(
        "btd,bsd->bts", video_temporal, spec_temporal
    )
    labels = jnp.broadcast_to(jnp.arange(t), logits.shape[:2])
    temporal = 0.5 * (
        optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        + optax.softmax_cross_entropy_with_integer_labels(
            logits.transpose(0, 2, 1), labels
        ).mean()
    )
    total = semantic + temporal_weight * temporal
    return {
        "total_loss": total,
        "semantic_loss": semantic,
        "temporal_loss": temporal,
    }


def temporal_semantic_bias_loss(
    video_temporal: jnp.ndarray,
    video_mean: jnp.ndarray,
    spec_temporal: jnp.ndarray,
    spec_mean: jnp.ndarray,
    logit_scale: jnp.ndarray,
    start_bias_index: jnp.ndarray,   # (B, 2) [video_start, spec_start]
    end_bias_index: jnp.ndarray,     # (B, 2)
    temporal_mix_weight: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Shifted-diagonal temporal CE for misaligned windows
    (ClipLoss_Temporal_Semantic_Bias, loss.py:297-445).

    When the video window starts later than the spec window, video frame v
    aligns with spec frame v − shift (and vice versa); out-of-window frames
    are masked out of the CE.
    """
    semantic = clip_loss(video_mean, spec_mean, logit_scale)

    b, t, _ = video_temporal.shape
    logits_v = logit_scale * jnp.einsum("btd,bsd->bts", video_temporal, spec_temporal)
    logits_s = jnp.swapaxes(logits_v, 1, 2)

    truncate_len = (end_bias_index - start_bias_index)[:, 0] + 1
    zp = t - truncate_len                                  # (B,)
    video_late = start_bias_index[:, 0] != 0               # (B,) bool
    pos = jnp.arange(t)[None, :]                           # (1, T)

    def masked_ce(logits, target, mask):
        ls = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(ls, target[..., None], axis=-1)[..., 0]
        per = -(picked * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1)
        return per.mean()

    # video→spec: case A (video late): valid v ∈ [zp, T), target v − zp
    #             case B:               valid v ∈ [0, T−zp), target v + zp
    shift = jnp.where(video_late, zp, -zp)[:, None]        # (B, 1)
    tgt_v2s = jnp.clip(pos - shift, 0, t - 1)
    mask_v2s = jnp.where(
        video_late[:, None], pos >= zp[:, None], pos < (t - zp[:, None])
    ).astype(logits_v.dtype)
    tgt_s2v = jnp.clip(pos + shift, 0, t - 1)
    mask_s2v = jnp.where(
        video_late[:, None], pos < (t - zp[:, None]), pos >= zp[:, None]
    ).astype(logits_v.dtype)

    temporal = 0.5 * (
        masked_ce(logits_v, tgt_v2s, mask_v2s)
        + masked_ce(logits_s, tgt_s2v, mask_s2v)
    )
    total = semantic + temporal_mix_weight * temporal
    return {
        "total_loss": total,
        "semantic_contrast_loss": semantic,
        "temporal_contrast_loss": temporal,
    }


def intra_contrast_temporal_mean_loss(
    video_max: jnp.ndarray,
    video_mean: jnp.ndarray,
    spec_max: jnp.ndarray,
    spec_mean: jnp.ndarray,
    logit_scale: jnp.ndarray,
    clip_num: int = 3,
    intra_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Max-pooled extra CE + mean-pooled per-video intra CE
    (ClipLoss_Intra_Contrast_Temporal_Mean, loss.py:543-645)."""
    extra = clip_loss(video_max, spec_max, logit_scale)

    bs, c = video_mean.shape
    v = video_mean.reshape(-1, clip_num, c)
    s = spec_mean.reshape(-1, clip_num, c)
    logits = logit_scale * jnp.einsum("bic,bjc->bij", v, s)
    labels = jnp.broadcast_to(jnp.arange(clip_num), logits.shape[:2])
    # NOTE: the reference averages the video-side CE with itself (loss.py:644)
    # — an apparent typo; here both directions are used.
    intra = 0.5 * (
        optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        + optax.softmax_cross_entropy_with_integer_labels(
            jnp.swapaxes(logits, 1, 2), labels
        ).mean()
    )
    total = extra + intra_weight * intra
    return {
        "total_loss": total,
        "extra_contrast_loss": extra,
        "intra_contrast_loss": intra,
    }


def retrieval_metrics(
    video_feats: jnp.ndarray, spec_feats: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """R@1/5/10 + mean/median rank, both directions
    (train_wds_intra_contrast.py:359-376 get_clip_metrics)."""
    logits_v = video_feats @ spec_feats.T
    out = {}
    for name, logits in (("video_to_spec", logits_v), ("spec_to_video", logits_v.T)):
        n = logits.shape[0]
        target = jnp.arange(n)
        ranking = jnp.argsort(-logits, axis=1)
        preds = jnp.argmax(ranking == target[:, None], axis=1)
        out[f"{name}_mean_rank"] = preds.mean() + 1
        out[f"{name}_median_rank"] = jnp.median(preds) + 1
        for k in (1, 5, 10):
            out[f"{name}_R@{k}"] = (preds < k).mean()
    return out
