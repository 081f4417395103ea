"""Training-time qualitative logging: the SoundLogger equivalent.

Behavioural spec: reference `adm/logger.py:1179-1389`
(SoundLogger_concat_fullset): every N steps take a few batch samples, run
the sampler with CFG, decode, Griffin-Lim-invert ground truth /
reconstruction / sample, and write wav + spec artifacts for eyeballing.

All DSP stays on device; artifacts are PCM16 wavs + npy specs (no
soundfile/ffmpeg in this environment).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.transforms import DEFAULT_MELSPEC, mel_to_wav
from ..utils.wav import write_wav


class SoundLogger:
    def __init__(
        self,
        log_dir: str,
        ldm,
        vae_params,
        every_n_steps: int = 1000,
        n_samples: int = 2,
        sampler_steps: int = 25,
        cfg_scale: float = 6.5,      # training-time logging scale
        gl_iters: int = 32,
        sr: int = 16000,
    ):
        self.dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.ldm = ldm
        self.vae_params = vae_params
        self.every = every_n_steps
        self.n = n_samples
        self.steps = sampler_steps
        self.cfg_scale = cfg_scale
        self.gl_iters = gl_iters
        self.sr = sr

    def maybe_log(self, step: int, params, batch: Dict, key) -> Optional[str]:
        if step % self.every != 0:
            return None
        return self.log(step, params, batch, key)

    def log(self, step: int, params, batch: Dict, key) -> str:
        n = min(self.n, batch["spec"].shape[0])
        # fp32 regardless of the training batch dtype: mixed-precision
        # staging delivers bf16 batches, but logged audio/spec artifacts
        # must stay plain-numpy-readable fp32
        spec_gt = jnp.asarray(batch["spec"][:n], dtype=jnp.float32)
        feat = jnp.asarray(batch["video_feat"][:n], dtype=jnp.float32)
        k1, k2, k3 = jax.random.split(key, 3)

        # ground truth, reconstruction, sample — like log_sound (ddpm.py:1362)
        z = self.ldm.encode_first_stage(self.vae_params, spec_gt)
        rec = self.ldm.decode_first_stage(self.vae_params, z)
        z_samp = self.ldm.sample(
            params, feat, k1, sampler="dpm", steps=self.steps,
            cfg_scale=self.cfg_scale,
        )
        samp = self.ldm.decode_first_stage(self.vae_params, z_samp)

        out_dir = os.path.join(self.dir, f"step_{step:08d}")
        os.makedirs(out_dir, exist_ok=True)
        for name, spec_img, kk in (
            ("gt", spec_gt, k2), ("rec", rec, k2), ("sample", samp, k3)
        ):
            mel = jnp.clip(spec_img[..., 0], 0.0, 1.0)
            wav = mel_to_wav(mel, kk, DEFAULT_MELSPEC, n_iter=self.gl_iters)
            for i in range(n):
                write_wav(
                    os.path.join(out_dir, f"{name}_{i}.wav"),
                    np.asarray(wav[i]), self.sr,
                )
            np.save(os.path.join(out_dir, f"{name}_spec.npy"), np.asarray(mel))
        return out_dir
