"""Headline benchmark: end-to-end 8-second-clip generation throughput.

Measures the full shipped inference operating point on one chip:
25-step DPM-Solver++(2M) with CFG 4.5 + alignment-classifier double guidance
(scale 50), flagship 860M UNet, VAE decode, batched on-device Griffin-Lim.

Prints ONE JSON line:
  {"metric": "clips_per_min_per_chip", "value": N, "unit": "clips/min",
   "vs_baseline": N/30}
vs_baseline is against the BASELINE.json north-star (≥30 clips/min/chip).

NOTE (axon relay): block_until_ready doesn't block; a host readback of a
scalar forces real completion — all timings here do that.
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.cond_encoder import VideoFeatEncoderPosembed
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS
from diff_foley_tpu.utils.precision import cast_floating

CLIPS = 16  # 8.192-s clips generated per timed run


def build_pipeline(key):
    set_attention_backend("pallas")  # fused attention kernel
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = ldm.init_params(k1)
    params = {"unet": cast_floating(params["unet"]), "cond": params["cond"]}
    vae_params = ldm.init_vae_params(k2)

    clf_cfg = dataclasses.replace(CLASSIFIER_BACKBONE, dtype="bfloat16")
    clf = ClassifierBackbone(clf_cfg)
    clf_params = clf.init(
        k3, jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)), jnp.zeros((1, 40, 512))
    )
    clf_params = cast_floating(clf_params)
    clf_cond = VideoFeatEncoderPosembed(embed_dim=512, seq_len=40)
    clf_cond_params = clf_cond.init(k4, jnp.zeros((1, 40, 512)))

    classifier = (clf.apply, clf_params, clf_cond_params, clf_cond)
    return DiffFoleyPipeline(ldm, params, vae_params, classifier=classifier)


def main():
    from diff_foley_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    pipe = build_pipeline(jax.random.PRNGKey(0))
    # 1 sample per window; CLIPS windows; serving mode (wav-only readback)
    gen = GenerationConfig(sample_num=1, return_spec=False)
    feats = np.random.default_rng(0).normal(size=(CLIPS * WINDOW_FEATS, 512))
    feats = feats.astype(np.float32)

    # warmup / compile
    out = pipe.generate(feats, jax.random.PRNGKey(1), gen)
    assert np.isfinite(out["wav"]).all()

    # timed: generate() ends with np.asarray host readbacks, so the wall
    # time includes real device completion.
    t0 = time.time()
    out = pipe.generate(feats, jax.random.PRNGKey(2), gen)
    dt = time.time() - t0
    _ = float(out["wav"].sum())

    clips_per_min = CLIPS / dt * 60.0
    print(
        json.dumps(
            {
                "metric": "clips_per_min_per_chip",
                "value": round(clips_per_min, 2),
                "unit": "clips/min",
                "vs_baseline": round(clips_per_min / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
