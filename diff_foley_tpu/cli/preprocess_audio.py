"""Dataset preprocessing: wav files → normalised mel-spec .npy files.

Reference equivalent: `data_preprocess/wav2spec.py` (get_spectrogram:
zero-pad/truncate to length−1 samples, TRANSFORMS chain, save npy).

Usage:
  python -m diff_foley_tpu.cli.preprocess_audio --wav-dir wavs/ \
      --out-dir audio_npy_spec/ --seconds 10 [--batch 32]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--batch", type=int, default=32)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..audio.transforms import wav_to_mel
    from ..utils.wav import read_wav

    os.makedirs(args.out_dir, exist_ok=True)
    length = int(args.sr * args.seconds)
    names = sorted(f for f in os.listdir(args.wav_dir) if f.endswith(".wav"))
    fn = jax.jit(wav_to_mel)

    batch, keys = [], []

    def flush():
        if not batch:
            return
        specs = np.asarray(fn(jnp.stack(batch)))
        for k, s in zip(keys, specs):
            np.save(os.path.join(args.out_dir, f"{k}_mel.npy"), s)
        batch.clear()
        keys.clear()

    for name in names:
        wav, sr = read_wav(os.path.join(args.wav_dir, name))
        if sr != args.sr:
            raise ValueError(f"{name}: sr {sr} != {args.sr} (resample first)")
        y = np.zeros(length, np.float32)
        y[: min(len(wav), length)] = wav[:length]
        y = y[: length - 1]  # wav2spec.py:184 'length-1' convention
        batch.append(jnp.asarray(y))
        keys.append(os.path.splitext(name)[0])
        if len(batch) == args.batch:
            flush()
    flush()
    print(f"wrote {len(names)} specs to {args.out_dir}")


if __name__ == "__main__":
    main()
