"""Alignment-classifier training driver (double guidance / eval classifier).

Reference equivalent: the stage2_ldm/main.py driver with the
Double_Guidance_Classifier config (SURVEY.md §3.4).

Usage:
  python -m diff_foley_tpu.cli.train_classifier --data-dir /data/vggsound \
      --logdir ./logs/classifier --batch-size 32 --max-steps 50000
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--logdir", default="./logs/classifier")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--max-steps", type=int, default=50000)
    p.add_argument("--save-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--vae-ckpt", default=None)
    p.add_argument("--tiny", action="store_true", help="tiny model for smoke runs")
    p.add_argument("--data-duration", type=float, default=10.0)
    p.add_argument("--data-truncate", type=int, default=131072)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from ..data.ldm_dataset import LDMDataConfig, SpecFeatDataset
    from ..data.loader import PrefetchLoader
    from ..parallel.mesh import make_mesh
    from ..train.classifier import ClassifierTrainConfig, ClassifierTrainer
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import MetricsLogger

    if args.tiny:
        from ..models.unet import UNetConfig
        from ..models.vae import AutoencoderKL, VAEConfig

        # the same tiny system as train_stage2 --tiny: identical VAE
        # downsampling (×8 → the latents this classifier scores are the
        # latents that tiny LDM samples) and context_dim = the raw CAVP
        # feature width, because the shipped guidance path feeds the
        # backbone raw 512-d features (alignment_classifier.py:285-287
        # quirk — see latent_diffusion.sample). A tiny classifier trained
        # here therefore composes with a tiny LDM for double guidance.
        trainer = ClassifierTrainer(
            backbone_cfg=UNetConfig(
                out_channels=1, model_channels=32, num_res_blocks=1,
                channel_mult=(1, 2), attention_resolutions=(2,),
                num_heads=4, context_dim=512,
            ),
            vae=AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2, 4, 4),
                                        num_res_blocks=1)),
            cfg=ClassifierTrainConfig(lr=args.lr),
        )
    else:
        trainer = ClassifierTrainer(cfg=ClassifierTrainConfig(lr=args.lr))
    from ..config import save_run_config

    save_run_config(
        args.logdir, "classifier",
        backbone=trainer.backbone.cfg, vae=trainer.vae.cfg, train=trainer.cfg,
        cond_seq_len=trainer.cond_encoder.seq_len,
    )
    from ..utils.checkpoint import is_native_logdir

    if is_native_logdir(args.vae_ckpt):
        # a cli.train_vae logdir: native first-stage weights (must match
        # the latent geometry this classifier scores)
        from ..utils.checkpoint import load_native_vae

        _, vae_params = load_native_vae(args.vae_ckpt,
                                        expect_cfg=trainer.vae.cfg)
    elif args.vae_ckpt:
        from ..utils.checkpoint import load_vae_checkpoint

        # convert against THIS trainer's VAE geometry (--tiny included),
        # not a hardcoded flagship config
        vae_params = load_vae_checkpoint(args.vae_ckpt, trainer.vae.cfg)
    else:
        import jax.numpy as jnp

        vae_params = trainer.vae.init(
            jax.random.PRNGKey(args.seed + 1), jnp.zeros((1, 128, 512, 3))
        )

    dataset = SpecFeatDataset.from_split_file(
        args.data_dir, "train", alignment_labels=True,
        cfg=LDMDataConfig(duration=args.data_duration,
                          truncate=args.data_truncate),
    )
    loader = PrefetchLoader(
        dataset, args.batch_size,
        process_index=jax.process_index(), process_count=jax.process_count(),
        seed=args.seed,
    )
    if len(dataset) < args.batch_size * jax.process_count():
        raise SystemExit(
            f"dataset has {len(dataset)} items < global batch "
            f"{args.batch_size * jax.process_count()} — the loader would "
            "yield zero batches and the training loop would spin forever"
        )

    state = trainer.init_train_state(jax.random.PRNGKey(args.seed))
    # persist the frozen VAE once: the classifier scores latents, so eval
    # (align_acc) needs the SAME encoder this run trained against
    vae_mgr = CheckpointManager(os.path.join(args.logdir, "vae"), max_to_keep=1)
    if vae_mgr.latest_step() is None:
        vae_mgr.save(0, vae_params)
    elif not args.resume:
        # fresh run in a reused logdir: refresh the persisted VAE (see
        # train_stage2 — a stale first stage poisons native loads)
        vae_mgr.save(vae_mgr.latest_step() + 1, vae_params)
    mgr = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)

    mesh = make_mesh()
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    vae_params = jax.device_put(vae_params, repl)
    step_fn = jax.jit(
        trainer.make_train_step(vae_params),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    logger = MetricsLogger(args.logdir, use_tensorboard=True)
    rng = jax.device_put(jax.random.PRNGKey(args.seed + 2), repl)

    step = int(state.step)
    epoch = 0
    with mesh:
        while step < args.max_steps:
            for batch in loader.epoch(epoch):
                batch = {k: jax.device_put(v, dsh) for k, v in batch.items()}
                state, metrics = step_fn(state, batch, rng)
                step = int(state.step)
                if step % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    logger.log(step, m, prefix="train/")
                    print(f"step {step}: bce={m['bce_loss']:.4f} acc={m['acc']:.3f}")
                if step % args.save_every == 0:
                    mgr.save(step, jax.device_get(state))
                if step >= args.max_steps:
                    break
            epoch += 1
    mgr.save(step, jax.device_get(state))


if __name__ == "__main__":
    main()
