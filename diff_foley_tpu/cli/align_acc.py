"""Alignment-accuracy evaluation CLI.

Reference equivalent: `evaluation/align_acc.py` — score a folder of
generated specs (.npy) against ground-truth CAVP features (.npz) with the
eval classifier at t=0; writes results_metric.txt.

Usage:
  python -m diff_foley_tpu.cli.align_acc --spec-dir gen/ --feat-dir feats/ \
      --classifier-ckpt eval_classifier.ckpt --out results_metric.txt
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--spec-dir", required=True)
    p.add_argument("--feat-dir", required=True)
    p.add_argument("--classifier-ckpt", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--out", default="results_metric.txt")
    return p.parse_args(argv)


def iter_batches(spec_dir, feat_dir, batch_size):
    names = sorted(
        os.path.splitext(f)[0] for f in os.listdir(spec_dir) if f.endswith(".npy")
    )
    batch = {"spec": [], "video_feat": []}
    for n in names:
        spec = np.load(os.path.join(spec_dir, f"{n}.npy")).astype(np.float32)
        spec = spec[:, :512]
        if spec.ndim == 2:
            spec = np.repeat(spec[:, :, None], 3, axis=2)  # 1→3ch, NHWC
        feat = np.load(os.path.join(feat_dir, f"{n}.npz"))["feat"].astype(
            np.float32
        )[:40]
        batch["spec"].append(spec)
        batch["video_feat"].append(feat)
        if len(batch["spec"]) == batch_size:
            yield {k: np.stack(v) for k, v in batch.items()}
            batch = {"spec": [], "video_feat": []}
    if batch["spec"]:
        yield {k: np.stack(v) for k, v in batch.items()}


def main(argv=None):
    args = parse_args(argv)
    from ..eval.align_acc import alignment_accuracy
    from ..train.classifier import ClassifierTrainer

    from ..utils.checkpoint import is_native_logdir

    if is_native_logdir(args.classifier_ckpt):
        # a diff_foley_tpu training logdir (cli.train_classifier output):
        # trainer config, params, and the frozen VAE all come from it
        from ..utils.checkpoint import load_native_classifier

        trainer, params, vae_params = load_native_classifier(
            args.classifier_ckpt
        )
        if vae_params is None:
            raise SystemExit(
                f"{args.classifier_ckpt}/vae holds no VAE weights (logdir "
                "predates VAE persistence) — re-save or score manually via "
                "eval.align_acc"
            )
    elif args.classifier_ckpt:
        from ..utils.checkpoint import load_reference_classifier

        trainer = ClassifierTrainer()
        cp = load_reference_classifier(args.classifier_ckpt)
        params = {"backbone": cp["backbone"], "cond": cp["cond"]}
        vae_params = cp["vae"]
    else:
        trainer = ClassifierTrainer()
        import jax.numpy as jnp

        params = trainer.init_params(jax.random.PRNGKey(0))
        vae_params = trainer.vae.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 128, 512, 3))
        )
        print("WARNING: random classifier weights (no --classifier-ckpt)")

    acc = alignment_accuracy(
        iter_batches(args.spec_dir, args.feat_dir, args.batch_size),
        trainer, params, trainer.vae, vae_params,
    )
    line = f"align_acc: {acc:.6f}"
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
