"""Dataset preprocessing: videos → per-frame CAVP feature .npz files.

Reference equivalent: the CAVP_feat/<split>/<id>.npz['feat'] inputs of the
stage-2 dataset (video_spec_dataset.py:41,86), produced with
Extract_CAVP_Features semantics (4 FPS, batch 40, pool=False, normalised).

Usage:
  python -m diff_foley_tpu.cli.extract_features --video-dir videos/ \
      --out-dir CAVP_feat/Train/ --cavp-ckpt cavp_epoch66.ckpt
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cavp-ckpt", default=None)
    p.add_argument("--fps", type=float, default=4.0)
    p.add_argument("--batch-size", type=int, default=40)
    p.add_argument("--frame-size", type=int, default=None,
                   help="ingest resize; defaults to the geometry a native "
                        "CAVP logdir was trained at, else 224")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..models.cavp import CAVPModel
    from ..video.ingest import extract_cavp_features

    from ..utils.checkpoint import is_native_logdir

    if is_native_logdir(args.cavp_ckpt):
        # a diff_foley_tpu stage-1 training logdir
        from ..utils.checkpoint import load_native_cavp, native_cavp_ingest_size

        model, variables = load_native_cavp(args.cavp_ckpt)
        if args.frame_size is None:
            args.frame_size = native_cavp_ingest_size(args.cavp_ckpt)
    elif args.cavp_ckpt:
        from ..utils.checkpoint import load_reference_cavp

        model = CAVPModel()
        variables = load_reference_cavp(args.cavp_ckpt)
    else:
        model = CAVPModel()
        print("WARNING: random CAVP weights (no --cavp-ckpt)")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 224, 224, 3)),
            jnp.zeros((1, 128, 32)), train=False,
        )
    encode = jax.jit(
        lambda v, x: model.apply(
            v, jnp.asarray(x),
            method=lambda m, a: m.encode_video(a, normalize=True, pool=False),
        )
    )
    os.makedirs(args.out_dir, exist_ok=True)
    exts = (".mp4", ".avi", ".mkv", ".mov", ".webm")
    names = sorted(
        f for f in os.listdir(args.video_dir) if f.lower().endswith(exts)
    )
    for name in names:
        feat = extract_cavp_features(
            os.path.join(args.video_dir, name), encode, variables,
            fps=args.fps, batch_size=args.batch_size, size=args.frame_size or 224,
        )
        key = os.path.splitext(name)[0]
        np.savez(os.path.join(args.out_dir, f"{key}.npz"), feat=feat)
        print(f"{name}: {feat.shape}")
    print(f"wrote {len(names)} feature files to {args.out_dir}")


if __name__ == "__main__":
    main()
