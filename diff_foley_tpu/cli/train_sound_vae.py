"""1D waveform VAE-GAN training driver (Sound_AutoencoderKL).

Reference equivalent: the Lightning main over `adm/models/autoencoder.py:14`
with the AudioLoss objective (audioloss_prior.py). Consumes a directory of
16 kHz wav files; crops random windows per step.

Usage:
  python -m diff_foley_tpu.cli.train_sound_vae --wav-dir /data/wavs \
      --window 65536 --batch-size 8 --steps 100000 --logdir ./logs/sound_vae
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--window", type=int, default=65536,
                   help="training crop (samples @16 kHz)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--disc-start", type=int, default=50001)
    p.add_argument("--channels", type=int, default=32,
                   help="encoder base channels (model width)")
    p.add_argument("--z-channels", type=int, default=128)
    p.add_argument("--logdir", default="./logs/sound_vae")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--save-every", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def iter_wav_batches(paths, window, batch_size, seed):
    """Random crops from random files, 16-bit PCM → float32 [-1, 1]."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    while True:
        batch = []
        while len(batch) < batch_size:
            path = paths[rng.integers(len(paths))]
            try:
                _, wav = wavfile.read(path)
            except Exception:
                continue
            # scale by the SOURCE dtype's full range (int32 wavs are
            # full-scale 2^31, not 2^15); float wavs are already [-1, 1]
            src_dtype = wav.dtype
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            if np.issubdtype(src_dtype, np.integer):
                scale = float(np.iinfo(src_dtype).max) + 1.0
                wav = wav.astype(np.float32) / scale
            else:
                wav = wav.astype(np.float32)
            if len(wav) < window:
                wav = np.pad(wav, (0, window - len(wav)))
            start = rng.integers(max(len(wav) - window, 0) + 1)
            batch.append(wav[start : start + window, None])
        yield np.stack(batch)


def main(argv=None):
    args = parse_args(argv)
    from ..train.sound_gan import AudioGANConfig, SoundVAETrainer
    from ..utils.checkpoint import CheckpointManager
    from ..utils.compile_cache import enable_compile_cache
    from ..utils.logging import MetricsLogger, Stopwatch

    enable_compile_cache()
    paths = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"),
                             recursive=True))
    assert paths, f"no wavs under {args.wav_dir}"
    print(f"{len(paths)} wav files")

    from ..models.sound_vae import SoundVAEConfig

    trainer = SoundVAETrainer(
        AudioGANConfig(lr=args.lr, disc_start=args.disc_start),
        SoundVAEConfig(channels=args.channels, z_channels=args.z_channels,
                       enc_out_channels=2 * args.z_channels),
    )
    from ..config import save_run_config

    save_run_config(
        args.logdir, "sound_vae", model=trainer.vae.cfg, train=trainer.cfg,
        window=args.window,
    )
    state = trainer.init_train_state(
        jax.random.PRNGKey(args.seed), n_samples=args.window
    )
    mgr = CheckpointManager(os.path.join(args.logdir, "ckpt"))
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    step_fn = jax.jit(trainer.make_train_step())
    logger = MetricsLogger(args.logdir, use_tensorboard=True)
    rng = jax.random.PRNGKey(args.seed + 1)
    watch = Stopwatch()

    stream = iter_wav_batches(paths, args.window, args.batch_size, args.seed)
    for batch in stream:
        state, logs = step_fn(state, jnp.asarray(batch), rng)
        step = int(state.step)
        if step % args.log_every == 0:
            logger.log(step, {k: float(v) for k, v in logs.items()},
                       prefix="train/")
            print(f"step {step}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in logs.items()))
        if step % args.save_every == 0:
            mgr.save(step, state)
        if step >= args.steps:
            break
    mgr.save(int(state.step), state)
    print(f"done at step {int(state.step)} ({watch.lap():.0f}s)")


if __name__ == "__main__":
    main()
