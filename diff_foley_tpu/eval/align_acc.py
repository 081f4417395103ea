"""Alignment-accuracy metric (the paper's Align-Acc protocol).

Behavioural spec: reference `evaluation/align_acc.py:41-153` +
`alignment_classifier_metric.py`: for each generated spec, encode to a
latent with the frozen VAE (×0.18215), encode the ground-truth CAVP
features, run the alignment classifier at **t=0**, round the sigmoid output
and compare to all-ones labels.

Functional + batched; shard the batch over the `data` mesh axis for the
reference's DDP-eval equivalent.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def make_align_acc_fn(classifier_trainer, vae, vae_params, scale_factor=0.18215):
    """Returns a jit'd fn(params, spec_batch, feat_batch) → (correct, total).

    spec_batch: (B, 128, T, 3) NHWC generated mel images (T ≥ 512 is
    truncated to 512 like evaluation/dataset.py:100-101).
    """

    @jax.jit
    def fn(params, spec, feat):
        spec = spec[:, :, :512, :]
        z = vae.apply(
            vae_params, spec, method=lambda m, a: m.encode(a).mode()
        )
        z = scale_factor * z
        t = jnp.zeros((spec.shape[0],), jnp.float32)  # t=0 (align_acc.py:83)
        p = classifier_trainer.apply(params, z, t, feat)
        correct = jnp.sum(jnp.round(p[:, 0]) == 1)
        return correct, spec.shape[0]

    return fn


def alignment_accuracy(
    batches: Iterator[Dict[str, np.ndarray]],
    classifier_trainer,
    classifier_params,
    vae,
    vae_params,
) -> float:
    """Stream batches {'spec', 'video_feat'} → overall accuracy."""
    fn = make_align_acc_fn(classifier_trainer, vae, vae_params)
    correct = total = 0
    for b in batches:
        c, n = fn(classifier_params, jnp.asarray(b["spec"]), jnp.asarray(b["video_feat"]))
        correct += int(c)
        total += int(n)
    return correct / max(total, 1)
