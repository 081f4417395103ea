"""bf16+Pallas production-envelope record (round-2 VERDICT weak #6).

The bench/serving operating point is bf16 params + the Pallas attention
kernel; flagship parity (PARITY_FLAGSHIP.json) is pinned fp32 only. This
script characterises the end-to-end numeric drift of the SHIPPED operating
point against the fp32 reference path **with the same underlying weights**:

  - flagship UNet single forward (bf16+pallas vs fp32+xla)
  - full 25-step DPM-Solver++ sampler output (CFG 4.5 + double guidance 50)
  - decoded mel spec and Griffin-Lim waveform out of pipeline.generate

Appends a "bf16_envelope" section to PARITY_FLAGSHIP.json. Tolerance
rationale lives in PARITY.md.

Run ON the TPU (Pallas kernels):  python scripts/bf16_envelope.py
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

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from diff_foley_tpu.utils.precision import cast_floating

WINDOWS = 2


def _stats(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.abs(a - b)
    return {
        "max_abs_diff": float(d.max()),
        "rel_to_std": float(d.max() / (np.abs(b).std() + 1e-12)),
        "mean_abs_diff": float(d.mean()),
        "out_std": float(np.abs(b).std()),
    }


def _build(dtype: str, backend: str, base_params, base_clf_params):
    set_attention_backend(backend)
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype=dtype))
    )
    clf_cfg = dataclasses.replace(CLASSIFIER_BACKBONE, dtype=dtype)
    clf = ClassifierBackbone(clf_cfg)
    if dtype == "bfloat16":
        params = {
            "unet": cast_floating(base_params["unet"]),
            "cond": base_params["cond"],
        }
        clf_params = cast_floating(base_clf_params)
    else:
        params, clf_params = base_params, base_clf_params
    return DiffFoleyPipeline(ldm, params, ldm_vae_params, (clf.apply, clf_params))


def _denegerate(params, seed):
    """Random init zero-inits every out-conv (reference zero_module
    semantics), which makes the whole eps-prediction identically zero and
    the bf16-vs-fp32 comparison vacuous. Fill all-zero float leaves with
    small seeded noise so every layer actually participates."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        if (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.size and not np.any(np.asarray(leaf))):
            leaf = jnp.asarray(
                rng.normal(size=leaf.shape) * 0.05, leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    global ldm_vae_params
    enable_compile_cache()
    t_start = time.time()

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    ldm0 = LatentDiffusion(LDMConfig())
    base_params = _denegerate(jax.jit(ldm0.init_params)(k1), 10)
    ldm_vae_params = _denegerate(jax.jit(ldm0.init_vae_params)(k2), 11)
    clf = ClassifierBackbone(CLASSIFIER_BACKBONE)
    base_clf_params = _denegerate(jax.jit(lambda k: clf.init(
        k, jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)), jnp.zeros((1, 40, 512)),
    ))(k3), 12)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(WINDOWS * WINDOW_FEATS, 512)).astype(np.float32)
    gen = GenerationConfig(sample_num=1, return_spec=True)
    key = jax.random.PRNGKey(7)

    # fixed UNet probe inputs
    x = jnp.asarray(rng.normal(size=(2, 16, 64, 4)), jnp.float32)
    t = jnp.asarray([123.0, 456.0], jnp.float32)
    c = jnp.asarray(rng.normal(size=(2, 40, 768)), jnp.float32)

    record = {
        "operating_point": "bf16 params + Pallas attention vs fp32 + XLA "
        "attention, same weights (cast), 25-step DPM CFG4.5+CG50",
    }

    # ---- fp32 + xla reference run ----------------------------------------
    pipe32 = _build("float32", "xla", base_params, base_clf_params)
    unet32 = np.asarray(
        jax.jit(lambda p, a, b_, cc: pipe32.ldm.unet.apply(p["unet"], a, b_, cc))(
            pipe32.params, x, t, c
        )
    )
    out32 = pipe32.generate(feats, key, gen)

    # ---- bf16 + pallas shipped run ---------------------------------------
    pipe16 = _build("bfloat16", "pallas", base_params, base_clf_params)
    unet16 = np.asarray(
        jax.jit(lambda p, a, b_, cc: pipe16.ldm.unet.apply(
            p["unet"], a.astype(jnp.bfloat16), b_, cc.astype(jnp.bfloat16)
        ))(pipe16.params, x, t, c),
        dtype=np.float32,
    )
    out16 = pipe16.generate(feats, key, gen)

    record["unet_fwd"] = _stats(unet16, unet32)
    record["decoded_spec"] = _stats(out16["spec"], out32["spec"])
    record["wav"] = _stats(out16["wav"], out32["wav"])
    record["seconds"] = round(time.time() - t_start, 1)

    out_path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "PARITY_FLAGSHIP.json")
    )
    with open(out_path) as f:
        full = json.load(f)
    full["bf16_envelope"] = record
    with open(out_path, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps({"bf16_envelope": record}, indent=2))


if __name__ == "__main__":
    main()
