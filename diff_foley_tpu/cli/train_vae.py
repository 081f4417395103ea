"""First-stage (spectrogram) VAE training driver.

Reference equivalent: the Lightning main.py driver with the autoencoder
training config — AutoencoderKL.training_step's alternating generator /
discriminator optimisation (diff_foley/models/autoencoder.py:341-404,
LPIPSWithDiscriminator losses). The resulting logdir is a native VAE
checkpoint: pass it to `--vae-ckpt` on cli.train_stage2 /
cli.train_classifier, or load with `utils.checkpoint.load_native_vae`.

Usage:
  python -m diff_foley_tpu.cli.train_vae --data-dir /data/vggsound \
      --logdir ./logs/vae --batch-size 8 --max-steps 100000
  # or over a flat directory of mel .npy files (cli.preprocess_audio output):
  python -m diff_foley_tpu.cli.train_vae --spec-dir specs/ --logdir ./logs/vae
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=None,
                   help="reference layout (<dir>/Train/audio_npy_spec)")
    p.add_argument("--spec-dir", default=None,
                   help="flat directory of .npy mel specs")
    p.add_argument("--logdir", default="./logs/vae")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=4.5e-6)
    p.add_argument("--max-steps", type=int, default=100000)
    p.add_argument("--disc-start", type=int, default=50001)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--save-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model for smoke runs (matches the stage-2 "
                        "--tiny latent geometry)")
    p.add_argument("--data-duration", type=float, default=10.0)
    p.add_argument("--data-truncate", type=int, default=131072)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if not (args.data_dir or args.spec_dir):
        raise SystemExit("provide --data-dir or --spec-dir")
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from ..config import save_run_config
    from ..data.ldm_dataset import LDMDataConfig, SpecDataset
    from ..data.loader import PrefetchLoader
    from ..models.vae import SD_VAE, AutoencoderKL, VAEConfig
    from ..parallel.mesh import make_mesh
    from ..train.vae import VAETrainConfig, VAETrainer
    from ..train.vae_losses import VAELossConfig
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import MetricsLogger

    vae_cfg = (
        VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
        if args.tiny else SD_VAE
    )
    tcfg = VAETrainConfig(
        lr=args.lr,
        loss=VAELossConfig(kl_weight=args.kl_weight,
                           disc_start=args.disc_start),
    )
    trainer = VAETrainer(AutoencoderKL(vae_cfg), cfg=tcfg)

    dcfg = LDMDataConfig(duration=args.data_duration,
                         truncate=args.data_truncate)
    dataset = (
        SpecDataset.from_split_file(args.data_dir, "train", cfg=dcfg)
        if args.data_dir else SpecDataset.from_dir(args.spec_dir, cfg=dcfg)
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

    sample_shape = (1, 128, args.data_truncate // dcfg.hop_len, 3)
    save_run_config(
        args.logdir, "vae", model=vae_cfg, train=tcfg,
        sample_shape=list(sample_shape),
    )
    state = trainer.init_train_state(
        jax.random.PRNGKey(args.seed), sample_shape=sample_shape
    )
    mgr = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    mesh = make_mesh()
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    step_fn = jax.jit(
        trainer.make_train_step(),
        in_shardings=(repl, dsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    logger = MetricsLogger(args.logdir, use_tensorboard=True)
    rng = jax.device_put(jax.random.PRNGKey(args.seed + 1), repl)

    step = int(state.step)
    epoch = 0
    with mesh:
        while step < args.max_steps:
            for batch in loader.epoch(epoch):
                state, metrics = step_fn(state, batch["spec"], rng)
                step += 1
                if step % args.log_every == 0:
                    m = {f"train/{k}": float(v) for k, v in metrics.items()}
                    logger.log(step, m)
                    print(f"step {step}: nll={m.get('train/nll_loss', 0):.4f}")
                if step % args.save_every == 0:
                    mgr.save(step, jax.device_get(state))
                if step >= args.max_steps:
                    break
            epoch += 1
    mgr.save(step, jax.device_get(state))
    print(f"done at step {step}; checkpoints in {args.logdir}/ckpt")


if __name__ == "__main__":
    main()
