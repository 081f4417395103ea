"""Attribution for the headline sampler inner loop at the shipped operating
point (batch 32 windows, bf16 + Pallas attention, CFG 4.5 + classifier
guidance 50): how much of each DPM-Solver++ step is the 2x-batch CFG UNet
call vs the alignment-classifier gradient vs solver arithmetic.

Run ON the TPU, quiet machine:  python scripts/profile_sampler_step.py
Appends a "sampler_step" section to PROFILE_r05.json.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from diff_foley_tpu.diffusion.guidance import GuidanceSpec, make_guided_eps_fn
from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from diff_foley_tpu.utils.precision import cast_floating
from diff_foley_tpu.utils.profiling import timed_chained

BATCH = 32


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

    # params must be jit ARGUMENTS, not closed-over constants: baked-in
    # 860M-param constants blow past the relay's compile-payload limit
    # (HTTP 413 from remote_compile).
    def build(p, cp, x_):
        def model_fn(xx, tt, cc):
            return ldm.unet.apply(p, xx, tt, cc)

        def classifier_fn(xx, tt, cc):
            return jax.nn.log_sigmoid(clf.apply(cp, xx, tt, cc))

        return model_fn, classifier_fn

    def cfg_eps(p, cp, x_):
        model_fn, _ = build(p, cp, x_)
        eps = make_guided_eps_fn(
            model_fn, cond, jnp.zeros_like(cond), GuidanceSpec(cfg_scale=4.5))
        return eps(x_, t, 1.0)

    def full_eps(p, cp, x_):
        model_fn, classifier_fn = build(p, cp, x_)
        eps = make_guided_eps_fn(
            model_fn, cond, jnp.zeros_like(cond),
            GuidanceSpec(cfg_scale=4.5, classifier_scale=50.0),
            classifier_fn=classifier_fn, classifier_cond=feats)
        return eps(x_, t, 1.0)

    def clf_grad(p, cp, x_):
        _, classifier_fn = build(p, cp, x_)
        return jax.grad(lambda xx: jnp.sum(classifier_fn(xx, t, feats)))(x_)

    def unet1(p, cp, x_):
        model_fn, _ = build(p, cp, x_)
        return model_fn(x_, t, cond)

    up = params["unet"]
    f_cfg = jax.jit(cfg_eps)
    f_full = jax.jit(full_eps)
    f_clf = jax.jit(clf_grad)
    f_unet1 = jax.jit(unet1)
    f_cfg = lambda x_, _f=f_cfg: _f(up, clf_params, x_)
    f_full = lambda x_, _f=f_full: _f(up, clf_params, x_)
    f_clf = lambda x_, _f=f_clf: _f(up, clf_params, x_)
    f_unet1 = lambda x_, _f=f_unet1: _f(up, clf_params, x_)

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

    path = os.path.join(os.path.dirname(__file__), "..", "PROFILE_r05.json")
    prof = json.load(open(path))
    prof["sampler_step"] = res
    json.dump(prof, open(path, "w"), indent=1)
    print("appended sampler_step to PROFILE_r05.json")


if __name__ == "__main__":
    main()
