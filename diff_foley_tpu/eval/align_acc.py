"""Alignment-accuracy metric (the paper's Align-Acc protocol).

Behavioural spec: reference `evaluation/align_acc.py:41-153` +
`alignment_classifier_metric.py`: for each generated spec, encode to a
latent with the frozen VAE (×0.18215), encode the ground-truth CAVP
features, run the alignment classifier at **t=0**, round the sigmoid output
and compare to all-ones labels.

Functional + batched. Pass a `jax.sharding.Mesh` with a `data` axis to shard
each eval batch over devices — the TPU equivalent of the reference's optional
NCCL-DDP eval (`align_acc.py:137`, DistributedSampler `:56`): inputs are laid
out `P("data")`, GSPMD partitions the encoder/classifier, and the final
correct/total sums are global (XLA inserts the all-reduce). Ragged last
batches are padded and masked out rather than dropped.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.padding import pad_axis0 as _pad_to


def make_align_acc_fn(
    classifier_trainer,
    vae,
    vae_params,
    scale_factor: float = 0.18215,
    mesh=None,
):
    """Returns a jit'd fn(params, spec, feat, valid) → (correct, total).

    spec: (B, 128, T, 3) NHWC generated mel images (T ≥ 512 is truncated to
    512 like evaluation/dataset.py:100-101). valid: (B,) {0,1} mask so padded
    rows (ragged last batch under sharding) don't count.

    With `mesh`, spec/feat/valid are consumed sharded over the `data` axis
    and the returned scalars are replicated.
    """

    def fn(params, spec, feat, valid):
        spec = spec[:, :, :512, :]
        z = vae.apply(
            vae_params, spec, method=lambda m, a: m.encode(a).mode()
        )
        z = scale_factor * z
        t = jnp.zeros((spec.shape[0],), jnp.float32)  # t=0 (align_acc.py:83)
        p = classifier_trainer.apply(params, z, t, feat)
        hit = (jnp.round(p[:, 0]) == 1).astype(jnp.int32) * valid
        return jnp.sum(hit), jnp.sum(valid)

    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(
            repl,
            NamedSharding(mesh, P("data", None, None, None)),
            NamedSharding(mesh, P("data", None, None)),
            row,
        ),
        out_shardings=(repl, repl),
    )


def alignment_accuracy(
    batches: Iterator[Dict[str, np.ndarray]],
    classifier_trainer,
    classifier_params,
    vae,
    vae_params,
    mesh=None,
) -> float:
    """Stream batches {'spec', 'video_feat'} → overall accuracy.

    With `mesh`, each batch is padded to a multiple of the `data` axis size
    and sharded across devices (padding masked out of the counts).
    """
    fn = make_align_acc_fn(classifier_trainer, vae, vae_params, mesh=mesh)
    n_data = 1 if mesh is None else mesh.shape["data"]
    correct = total = 0
    for b in batches:
        spec = np.asarray(b["spec"])
        feat = np.asarray(b["video_feat"])
        n = spec.shape[0]
        m = -(-n // n_data) * n_data  # round up to a shardable batch
        valid = np.zeros((m,), np.int32)
        valid[:n] = 1
        c, t = fn(
            classifier_params,
            jnp.asarray(_pad_to(spec, m)),
            jnp.asarray(_pad_to(feat, m)),
            jnp.asarray(valid),
        )
        correct += int(c)
        total += int(t)
    return correct / max(total, 1)
