"""Stage-2 LDM training driver.

Reference equivalent: `training/stage2_ldm/main.py` + launch.sh
(`python main.py --base cfg.yaml -t --gpus ...`). Differences are TPU-native:
one process drives the whole `data`-axis mesh (no DDP fork), orbax
checkpoints, JSONL metrics.

Usage:
  python -m diff_foley_tpu.cli.train_stage2 \
      --base /root/reference/inference/config/Stage2_LDM.yaml \
      --data-dir /data/vggsound --logdir ./logs/stage2 \
      --batch-size 16 --max-steps 100000
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", type=str, default=None, help="model YAML (reference format)")
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--logdir", type=str, default="./logs/stage2")
    p.add_argument("--batch-size", type=int, default=16, help="global batch")
    p.add_argument("--base-lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--max-steps", type=int, default=100000)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--mixed-precision", action="store_true",
                   help="bf16 forward/backward against fp32 master params "
                        "(the TPU analogue of the reference's AMP fp16, "
                        "main.py precision=16; no loss scaling needed)")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--save-every", type=int, default=2000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--sound-log-every", type=int, default=0,
                   help="0 disables the SoundLogger callback")
    p.add_argument("--val-every", type=int, default=0,
                   help="validation every N steps (0 disables); monitors "
                        "val/loss_simple(_ema) like the reference ckpt "
                        "selection")
    p.add_argument("--val-batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--vae-ckpt", type=str, default=None,
                   help="torch VAE/LDM ckpt to convert for the frozen first stage")
    p.add_argument("--tiny", action="store_true", help="tiny model for smoke runs")
    p.add_argument("--data-duration", type=float, default=10.0,
                   help="pad-by-tiling target seconds (reference duration)")
    p.add_argument("--data-truncate", type=int, default=131072,
                   help="crop length in samples (reference truncate; "
                        "131072 = 8.192 s → 512 spec frames)")
    p.add_argument("--fsdp", action="store_true",
                   help="fully shard params/Adam state/EMA over the data "
                        "axis (ZeRO-3 semantics via GSPMD) instead of "
                        "replicating them")
    return p.parse_args(argv)


def build_ldm(args):
    from ..diffusion.latent_diffusion import LatentDiffusion, LDMConfig
    from ..models.unet import UNetConfig
    from ..models.vae import VAEConfig

    if args.tiny:
        return LatentDiffusion(LDMConfig(
            unet=UNetConfig(model_channels=32, num_res_blocks=1,
                            channel_mult=(1, 2), attention_resolutions=(2,),
                            num_heads=4, context_dim=24),
            vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
            cond_embed_dim=24,
        ))
    if args.base:
        from ..config import load_ldm_from_yaml

        return load_ldm_from_yaml(args.base)
    from ..diffusion.latent_diffusion import LatentDiffusion, LDMConfig

    return LatentDiffusion(LDMConfig())


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from ..data.ldm_dataset import LDMDataConfig, SpecFeatDataset
    from ..data.loader import PrefetchLoader
    from ..parallel.mesh import make_mesh
    from ..train.callbacks import SoundLogger
    from ..train.stage2_ldm import (
        Stage2TrainConfig, init_train_state, make_train_step,
    )
    from ..utils.checkpoint import CheckpointManager
    from ..utils.logging import MetricsLogger, Stopwatch

    ldm = build_ldm(args)
    tcfg = Stage2TrainConfig(
        base_lr=args.base_lr, warmup_steps=args.warmup_steps,
        use_ema=args.use_ema, accum_steps=args.accum_steps,
        compute_dtype="bfloat16" if args.mixed_precision else None,
    )
    dcfg = LDMDataConfig(
        duration=args.data_duration, truncate=args.data_truncate
    )
    dataset = SpecFeatDataset.from_split_file(args.data_dir, "train", cfg=dcfg)
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
    val_loader = None
    if args.val_every:
        try:
            val_ds = SpecFeatDataset.from_split_file(
                args.data_dir, "valid", cfg=dcfg)
        except FileNotFoundError:
            val_ds = dataset  # fall back: monitor on train split
        val_loader = PrefetchLoader(
            val_ds, args.batch_size,
            process_index=jax.process_index(),
            process_count=jax.process_count(), seed=args.seed + 99,
        )

    mesh = make_mesh()
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    key = jax.random.PRNGKey(args.seed)
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(key)
    from ..utils.profiling import count_params

    count_params(state.params, verbose=True, name="LatentDiffusion")
    from ..utils.checkpoint import is_native_logdir

    if is_native_logdir(args.vae_ckpt):
        # a cli.train_vae logdir: native first-stage weights
        from ..utils.checkpoint import load_native_vae

        _, vae_params = load_native_vae(args.vae_ckpt, expect_cfg=ldm.cfg.vae)
    elif args.vae_ckpt:
        from ..utils.checkpoint import load_vae_checkpoint

        vae_params = load_vae_checkpoint(args.vae_ckpt, ldm.cfg.vae)
    else:
        vae_params = ldm.init_vae_params(jax.random.PRNGKey(args.seed + 1))

    from ..config import save_run_config

    # self-describing logdir: config + the (frozen) first-stage VAE weights,
    # so load_native_ldm can rebuild the full generative model from the
    # logdir alone (the reference ships the VAE inside its composite ckpt)
    save_run_config(args.logdir, "stage2_ldm", model=ldm.cfg, train=tcfg)
    vae_mgr = CheckpointManager(os.path.join(args.logdir, "vae"), max_to_keep=1)
    if vae_mgr.latest_step() is None:
        vae_mgr.save(0, vae_params)
    elif not args.resume:
        # fresh run in a reused logdir: the persisted VAE must describe THIS
        # run, not a previous one (a stale first stage silently corrupts
        # every later native load); max_to_keep=1 prunes the old step
        vae_mgr.save(vae_mgr.latest_step() + 1, vae_params)

    mgr = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    if args.fsdp:
        from ..parallel.sharding_rules import shard_state_fsdp

        state, state_sh = shard_state_fsdp(state, mesh)
    else:
        state, state_sh = jax.device_put(state, repl), repl
    vae_params = jax.device_put(vae_params, repl)
    train_step = make_train_step(ldm, tcfg)
    step_fn = jax.jit(
        train_step,
        in_shardings=(state_sh, repl, dsh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    eval_fn = jax.jit(
        train_step.eval_step,
        in_shardings=(state_sh, repl, dsh, repl), out_shardings=repl,
    )
    logger = MetricsLogger(args.logdir, use_tensorboard=True)
    sound = (
        SoundLogger(os.path.join(args.logdir, "sound"), ldm, vae_params,
                    every_n_steps=args.sound_log_every)
        if args.sound_log_every else None
    )

    from ..utils.resilience import PreemptionCheckpointer

    preempt = PreemptionCheckpointer()  # SIGUSR1/SIGTERM → checkpoint (melk)
    rng = jax.device_put(jax.random.PRNGKey(args.seed + 2), repl)
    watch = Stopwatch()
    step = int(state.step)
    epoch = 0
    from ..data.loader import DevicePrefetcher

    with mesh:
        while step < args.max_steps:
            # stage batch k+1 onto the device while the step runs on batch k;
            # under mixed precision the fp32→bf16 cast happens host-side so
            # half the bytes cross the link (numerically identical — the
            # trainer casts inputs to the compute dtype anyway)
            staged = DevicePrefetcher(
                loader.epoch(epoch), sharding=dsh,
                cast_dtype="bfloat16" if args.mixed_precision else None,
            )
            for batch in staged:
                state, metrics = step_fn(state, vae_params, batch, rng)
                # host-side step counter: reading int(state.step) here would
                # force a device readback every step and serialize dispatch
                # against the relay round trip
                step += 1
                if step % args.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["sec_per_step"] = watch.lap() / args.log_every
                    logger.log(step, m, prefix="train/")
                    print(f"step {step}: loss={m['loss']:.4f}")
                if args.val_every and step % args.val_every == 0:
                    vlosses = []
                    for vi, vb in enumerate(
                        val_loader.epoch(step // args.val_every)
                    ):
                        vb = {k: jax.device_put(v, dsh) for k, v in vb.items()}
                        # independent (t, noise) draws per val batch/round —
                        # a fixed rng would score every batch at one draw
                        vrng = jax.random.fold_in(
                            jax.random.fold_in(rng, step), vi)
                        vm = eval_fn(state, vae_params, vb, vrng)
                        vlosses.append(float(vm["loss_simple"]))
                        if len(vlosses) >= args.val_batches:
                            break
                    name = "loss_simple_ema" if tcfg.use_ema else "loss_simple"
                    logger.log(step, {name: float(np.mean(vlosses))}, prefix="val/")
                    print(f"step {step}: val/{name}={np.mean(vlosses):.4f}")
                if step % args.save_every == 0 or preempt.should_checkpoint:
                    mgr.save(step, jax.device_get(state))
                    preempt.clear()
                if sound is not None:
                    sound.maybe_log(step, state.params, batch,
                                    jax.random.PRNGKey(step))
                if step >= args.max_steps:
                    break
            epoch += 1
    mgr.save(step, jax.device_get(state))
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
