"""Attribution for the headline sampler inner loop at the shipped operating
point (batch 32 windows, bf16 + Pallas attention, CFG 4.5 + classifier
guidance 50): how much of each DPM-Solver++ step is the 2x-batch CFG UNet
call vs the alignment-classifier gradient vs solver arithmetic.

Run ON the TPU, quiet machine:  python scripts/profile_sampler_step.py
Appends a "sampler_step" section to PROFILE_r03.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.guidance import GuidanceSpec, make_guided_eps_fn
from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from diff_foley_tpu.utils.precision import cast_floating

BATCH = 32
CHAIN = 10


def timed_chained(fn, x, iters=4, chain=CHAIN):
    out = fn(x)
    _ = float(jnp.asarray(out, jnp.float32).sum())
    times = []
    for _ in range(iters):
        y = x
        t0 = time.time()
        for _c in range(chain):
            y = fn(y).astype(x.dtype)
        _ = float(jnp.asarray(y, jnp.float32).sum())
        times.append((time.time() - t0) / chain)
    return float(np.median(times))


def main():
    enable_compile_cache()
    set_attention_backend("pallas")
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    params = jax.jit(ldm.init_params)(jax.random.PRNGKey(0))
    params = {"unet": cast_floating(params["unet"]), "cond": params["cond"]}

    clf_cfg = dataclasses.replace(CLASSIFIER_BACKBONE, dtype="bfloat16")
    clf = ClassifierBackbone(clf_cfg)
    clf_params = cast_floating(jax.jit(lambda k: clf.init(
        k, jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)), jnp.zeros((1, 40, 512)),
    ))(jax.random.PRNGKey(1)))

    x = jnp.zeros((BATCH, 16, 64, 4), jnp.bfloat16)
    t = jnp.zeros((BATCH,), jnp.float32)
    cond = jnp.zeros((BATCH, 40, 768), jnp.bfloat16)
    feats = jnp.zeros((BATCH, 40, 512), jnp.bfloat16)

    def model_fn(x_, t_, c_):
        return ldm.unet.apply(params["unet"], x_, t_, c_)

    def classifier_fn(x_, t_, c_):
        return jax.nn.log_sigmoid(clf.apply(clf_params, x_, t_, c_))

    # (a) CFG-only guided eps: one 2x-batch UNet call
    eps_cfg = make_guided_eps_fn(
        model_fn, cond, jnp.zeros_like(cond), GuidanceSpec(cfg_scale=4.5))
    f_cfg = jax.jit(lambda x_: eps_cfg(x_, t, 1.0))

    # (b) full guidance: CFG + classifier gradient (the shipped step)
    eps_full = make_guided_eps_fn(
        model_fn, cond, jnp.zeros_like(cond),
        GuidanceSpec(cfg_scale=4.5, classifier_scale=50.0),
        classifier_fn=classifier_fn, classifier_cond=feats)
    f_full = jax.jit(lambda x_: eps_full(x_, t, 1.0))

    # (c) classifier gradient alone (fwd+bwd of the half-UNet backbone)
    grad_fn = jax.grad(lambda x_: jnp.sum(classifier_fn(x_, t, feats)))
    f_clf = jax.jit(lambda x_: grad_fn(x_))

    # (d) single-batch UNet forward (no CFG doubling), for the 2x check
    f_unet1 = jax.jit(lambda x_: model_fn(x_, t, cond))

    res = {
        "operating_point": f"batch {BATCH}, bf16 + Pallas attention, "
                           "CFG 4.5 + CG 50, chained x10",
        "cfg_eps_ms": round(timed_chained(f_cfg, x) * 1e3, 2),
        "full_eps_ms": round(timed_chained(f_full, x) * 1e3, 2),
        "classifier_grad_ms": round(timed_chained(f_clf, x) * 1e3, 2),
        "unet_single_batch_ms": round(timed_chained(f_unet1, x) * 1e3, 2),
    }
    res["classifier_share_pct"] = round(
        100.0 * (res["full_eps_ms"] - res["cfg_eps_ms"]) / res["full_eps_ms"], 1)
    print(json.dumps(res, indent=1))

    path = os.path.join(os.path.dirname(__file__), "..", "PROFILE_r03.json")
    prof = json.load(open(path))
    prof["sampler_step"] = res
    json.dump(prof, open(path, "w"), indent=1)
    print("appended sampler_step to PROFILE_r03.json")


if __name__ == "__main__":
    main()
