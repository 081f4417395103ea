"""Device-time attribution for the flagship stage-2 train step at the
shipped operating point (bf16 mixed precision, no remat, batch 32) —
answers where the gap between 41.7% train MFU and the 51.6% forward MFU
lives (bwd convs, VAE encode, optimizer update).

Run ON the TPU, quiet machine:  python scripts/profile_train_step.py
Appends a "train_step" section to PROFILE_r05.json.
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import glob

import jax
import jax.numpy as jnp

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from profile_unet import parse_xspace

BATCH = 32
CHAIN = 5


def capture_trace(tmpdir: str):
    from diff_foley_tpu.ops.attention import set_attention_backend

    set_attention_backend("pallas")  # shipped operating point (fwd + bwd)
    ldm = LatentDiffusion(LDMConfig())
    tcfg = Stage2TrainConfig(mu_dtype="bfloat16", compute_dtype="bfloat16")
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(
        jax.random.PRNGKey(0)
    )
    vae_params = jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1))
    batch = {
        "spec": jnp.zeros((BATCH, 128, 512, 3)),
        "video_feat": jnp.zeros((BATCH, 40, 512)),
    }
    step = jax.jit(make_train_step(ldm, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)
    state, metrics = step(state, vae_params, batch, rng)
    _ = float(metrics["loss"])  # compile + warm

    jax.profiler.start_trace(tmpdir)
    for _ in range(CHAIN):
        state, metrics = step(state, vae_params, batch, rng)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()


def main():
    enable_compile_cache()
    tmpdir = "/tmp/diff_foley_xprof_train"
    os.makedirs(tmpdir, exist_ok=True)
    capture_trace(tmpdir)
    paths = sorted(glob.glob(tmpdir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane.pb under {tmpdir}"
    parsed = parse_xspace(paths[-1])

    def category(name: str) -> str:
        head = name.lstrip("%").split(" ", 1)[0]
        base = head.split(".", 1)[0]
        if base == "custom-call" or "tpu_custom_call" in name:
            return "custom-call(pallas)"
        return base

    section = {
        "operating_point": (
            f"flagship stage-2 train step, batch {BATCH}, bf16 mixed "
            f"precision (fp32 masters), no remat, {CHAIN} chained steps"
        ),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "planes": {},
    }
    for pname, plane in parsed.items():
        agg = plane["lines"].get("XLA Ops")
        if not agg:
            continue
        total = sum(v[0] for v in agg.values())
        if total == 0:
            continue
        cats = defaultdict(lambda: [0.0, 0])
        for name, (ps, cnt) in agg.items():
            c = cats[category(name)]
            c[0] += ps
            c[1] += cnt
        cat_top = sorted(cats.items(), key=lambda kv: -kv[1][0])
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:15]
        section["planes"][pname] = {
            "line": "XLA Ops",
            "total_ms": round(total / 1e9, 3),
            "per_step_ms": round(total / 1e9 / CHAIN, 3),
            "by_category": [
                {"category": c, "ms": round(ps / 1e9, 3),
                 "pct": round(100.0 * ps / total, 2), "count": cnt}
                for c, (ps, cnt) in cat_top
            ],
            "top_ops": [
                {"name": name[:140], "ms": round(ps / 1e9, 3),
                 "pct": round(100.0 * ps / total, 2), "count": cnt}
                for name, (ps, cnt) in top
            ],
        }

    out = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "PROFILE_r05.json"))
    with open(out) as f:
        record = json.load(f)
    record["train_step"] = section
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(section, indent=2)[:4000])


if __name__ == "__main__":
    main()
