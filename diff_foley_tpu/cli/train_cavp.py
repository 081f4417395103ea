"""Stage-1 CAVP contrastive training driver.

Reference equivalent: `torchrun -m training.main_wds_intra_contrast ...`
(open_cavp_main/launch_script.sh). TPU-native: one process drives the
`data`-axis mesh; the contrastive all-gather is implicit in the global
logits matmul under GSPMD.

Usage:
  python -m diff_foley_tpu.cli.train_cavp \
      --train-shards '/data/shards/vggsound-{000000..000031}.tar' \
      --batch-size 30 --clip-num 3 --lr 8e-4 --warmup 200 \
      --logdir ./logs/cavp
"""
from __future__ import annotations

import argparse
import glob as globlib
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def expand_braces(pattern: str):
    """webdataset-style '{000000..000031}' brace expansion."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if not m:
        return sorted(globlib.glob(pattern)) or [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [
        pattern[: m.start()] + str(i).zfill(width) + pattern[m.end() :]
        for i in range(int(lo), int(hi) + 1)
    ]


def stack_micro_batches(samples, accum_freq: int, batch_size: int):
    """Stack buffered samples into a step batch: (B, …) normally, or
    (K, B, …) micro-batches when accum_freq > 1 (feature-cache mode)."""
    arr = np.stack(samples)
    if accum_freq > 1:
        arr = arr.reshape(accum_freq, batch_size, *arr.shape[1:])
    return arr


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-shards", required=True)
    p.add_argument("--batch-size", type=int, default=30, help="videos per step (global)")
    p.add_argument("--clip-num", type=int, default=3)
    p.add_argument("--shift-lb", type=int, default=8)
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--steps-per-epoch", type=int, default=0, help="0 = full shards")
    p.add_argument("--intra-weight", type=float, default=1.0)
    p.add_argument("--accum-freq", type=int, default=1,
                   help="feature-cache gradient accumulation (reference "
                        "--accum_freq): K micro-batches per optimizer step, "
                        "full K*B contrastive batch semantics")
    p.add_argument("--embed-dim", type=int, default=512)
    p.add_argument("--video-encode", default="slowonly",
                   choices=["slowonly", "x3d", "i3d", "r2plus1d", "vivit"],
                   help="video tower (reference --video_encode)")
    p.add_argument("--spec-encode", default="cnn14",
                   choices=["cnn14", "cnn10", "resnet50", "spec_vit", "spec_vit_mean"],
                   help="audio tower (reference --spec_encode)")
    p.add_argument("--logdir", default="./logs/cavp")
    p.add_argument("--save-every-epochs", type=int, default=3)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mixed-precision", action="store_true",
                   help="bf16 tower compute against fp32 masters (the "
                        "reference's open_clip --precision amp; no loss "
                        "scaling needed on TPU). Shipped towers only "
                        "(slowonly x cnn14/cnn10)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ shard reader")
    p.add_argument("--uint8-video", action="store_true",
                   help="ship video to the device as raw uint8 and divide "
                        "by 255 on device: half the host->device bytes of "
                        "bf16 (4x vs fp32) and no host float conversion; "
                        "numerically identical")
    p.add_argument("--val-shards", default=None,
                   help="validation shards for retrieval R@k eval")
    p.add_argument("--val-frequency", type=int, default=2,
                   help="run retrieval eval every N epochs")
    p.add_argument("--val-samples", type=int, default=64)
    p.add_argument("--tiny", action="store_true",
                   help="smoke-geometry towers for CI/smoke runs")
    return p.parse_args(argv)


def run_retrieval_eval(model, state, shards, cfg, n_samples, iter_fn):
    """Pooled-feature retrieval metrics over a validation stream
    (train_wds_intra_contrast.py:234-376 evaluate/get_clip_metrics)."""
    import jax.numpy as jnp

    from ..train.losses import retrieval_metrics

    encode = jax.jit(
        lambda variables, v, s: (
            model.apply(variables, v, method=lambda m, a: m.encode_video(
                a, normalize=True, pool=True, train=False)),
            model.apply(variables, s, method=lambda m, a: m.encode_spec(
                a, normalize=True, pool=True, train=False)),
        )
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vs, ss = [], []
    for sample in iter_fn(shards, seed=1234, epoch=0, cfg=cfg):
        v_np = np.asarray(sample["video"][:1])
        if v_np.dtype == np.uint8:
            # --uint8-video streams raw bytes; only the TRAIN step divides
            # by 255 on device — eval must normalize here or retrieval R@k
            # is computed on 255×-scaled inputs
            v_np = v_np.astype(np.float32) / 255.0
        v, s = encode(
            variables, jnp.asarray(v_np), jnp.asarray(sample["spec"][:1]),
        )
        vs.append(np.asarray(v))
        ss.append(np.asarray(s))
        if len(vs) >= n_samples:
            break
    if len(vs) < 2:
        return {}
    m = retrieval_metrics(jnp.asarray(np.concatenate(vs)),
                          jnp.asarray(np.concatenate(ss)))
    return {k: float(v) for k, v in m.items()}


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from ..data.cavp_shards import CAVPShardConfig, iter_shards
    from ..models.cavp import CAVPConfig, CAVPModel
    from ..parallel.mesh import make_mesh
    from ..train.stage1_cavp import (
        Stage1TrainConfig, init_train_state, make_accum_train_step,
        make_train_step,
    )
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import MetricsLogger, Stopwatch

    shards = expand_braces(args.train_shards)
    print(f"{len(shards)} shards")
    scfg = CAVPShardConfig(clip_num=args.clip_num, shift_lb=args.shift_lb,
                           uint8_video=args.uint8_video)

    tiny_kw = dict(
        video_stage_blocks=(1, 1, 1, 1), video_base_channels=16,
        spec_channels=(8, 8, 8, 8, 8, 8),
    ) if args.tiny else {}
    model = CAVPModel(CAVPConfig(
        embed_dim=args.embed_dim,
        video_arch=args.video_encode,
        spec_arch=args.spec_encode,
        **tiny_kw,
    ))
    tcfg = Stage1TrainConfig(
        lr=args.lr, warmup_steps=args.warmup, clip_num=args.clip_num,
        intra_weight=args.intra_weight, accum_freq=args.accum_freq,
        compute_dtype="bfloat16" if args.mixed_precision else None,
    )
    video_shape = (1, 16, 16, 16, 3) if args.tiny else (1, 16, 224, 224, 3)
    spec_shape = (1, 128, 256)
    state = init_train_state(
        model, jax.random.PRNGKey(args.seed), tcfg,
        video_shape=video_shape, spec_shape=spec_shape,
    )
    from ..config import save_run_config

    # self-describing logdir for load_native_cavp (init shapes recorded so
    # input-geometry-dependent params, e.g. ViT pos-embeds, rebuild exactly)
    save_run_config(
        args.logdir, "stage1_cavp", model=model.cfg, train=tcfg,
        init_video_shape=list(video_shape), init_spec_shape=list(spec_shape),
    )
    mgr = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    step = int(state.step)

    mesh = make_mesh()
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    if tcfg.accum_freq > 1:
        inner_step = make_accum_train_step(model, tcfg, tcfg.accum_freq)
        # micro-batch axis K leads; the data axis is axis 1
        dsh = NamedSharding(mesh, P(None, "data"))
    else:
        inner_step = make_train_step(model, tcfg)
    step_fn = jax.jit(
        inner_step,
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    logger = MetricsLogger(args.logdir, use_tensorboard=True)
    rng = jax.device_put(jax.random.PRNGKey(args.seed + 1), repl)
    watch = Stopwatch()

    iter_fn = iter_shards
    if args.native_loader:
        from ..data.native_loader import iter_shards_native as iter_fn  # noqa

    with mesh:
        for epoch in range(args.epochs):
            stream = iter_fn(
                shards, seed=args.seed, epoch=epoch,
                process_index=jax.process_index(),
                process_count=jax.process_count(), cfg=scfg,
            )
            buf = {"video": [], "spec": []}
            n_steps = 0
            samples_per_step = args.batch_size * tcfg.accum_freq
            for sample in stream:
                buf["video"].append(sample["video"])
                buf["spec"].append(sample["spec"])
                if len(buf["video"]) == samples_per_step:
                    batch = {
                        k: jax.device_put(
                            stack_micro_batches(
                                v, tcfg.accum_freq, args.batch_size),
                            dsh,
                        )
                        for k, v in buf.items()
                    }
                    buf = {"video": [], "spec": []}
                    state, metrics = step_fn(state, batch, rng)
                    n_steps += 1
                    # host-side counter: int(state.step) here would force a
                    # per-step device readback that serializes dispatch
                    step += 1
                    if step % args.log_every == 0:
                        m = {k: float(v) for k, v in metrics.items()}
                        m["sec_per_step"] = watch.lap() / args.log_every
                        logger.log(step, m, prefix="train/")
                        print(f"epoch {epoch} step {step}: "
                              f"loss={m['total_loss']:.4f}")
                    if args.steps_per_epoch and n_steps >= args.steps_per_epoch:
                        break
            if args.val_shards and (epoch + 1) % args.val_frequency == 0:
                vm = run_retrieval_eval(
                    model, jax.device_get(state), expand_braces(args.val_shards),
                    scfg, args.val_samples, iter_fn,
                )
                if vm:
                    logger.log(int(state.step), vm, prefix="val/")
                    print(f"epoch {epoch} retrieval: "
                          f"v2s R@1={vm['video_to_spec_R@1']:.3f} "
                          f"s2v R@1={vm['spec_to_video_R@1']:.3f}")
            if (epoch + 1) % args.save_every_epochs == 0:
                mgr.save(int(state.step), jax.device_get(state))
    mgr.save(int(state.step), jax.device_get(state))


if __name__ == "__main__":
    main()
