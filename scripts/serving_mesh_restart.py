"""Multi-device (mesh) serving restart tiers (round-4 VERDICT weak #3).

Round 4 measured restart tiers for single-device serving only — the AOT
executable path was guarded off under a mesh, so a multi-chip serving
process still paid minutes of jax trace+lower per bucket on every restart.
Round 5 keys the AOT cache on device topology and pins deserialization to
the saved device assignment (utils/aot.py), so meshed pipelines restore
from disk too. This script EXECUTES that story on an emulated 4-device
data mesh (8 forced CPU devices, same recipe as tests/conftest.py):

  phase "cold":  build a meshed pipeline, aot_warmup traces+compiles each
                 bucket and serializes it (records seconds per bucket)
  phase "warm":  a FRESH PROCESS with the same topology restores every
                 bucket from disk — no tracing — and serves a request whose
                 output must match the cold process's bit-for-bit

Merges a "mesh_restart" section into SERVING_r05.json.

Run anywhere (self-bootstraps the CPU mesh):
    python scripts/serving_mesh_restart.py
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_ROLE = "_DFT_MESH_RESTART_ROLE"
N_DEV, N_DATA = 8, 4
BUCKETS = (4, 8)


def _phase(role: str, cache_dir: str, out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diff_foley_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LDMConfig,
    )
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.parallel.mesh import make_mesh
    from diff_foley_tpu.pipeline import (
        DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS,
    )
    from diff_foley_tpu.serving import BatchingEngine
    from diff_foley_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    assert len(jax.devices()) == N_DEV, jax.devices()
    mesh = make_mesh(n_data=N_DATA, devices=jax.devices()[:N_DATA])

    # mid-size model: big enough that trace+compile visibly dominates a
    # cold start, small enough for the CPU mesh
    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(model_channels=64, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(2,),
                        num_heads=4, context_dim=64),
        vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        cond_embed_dim=64, cond_seq_len=WINDOW_FEATS,
    ))
    params = jax.jit(ldm.init_params)(jax.random.PRNGKey(0))
    vae_params = jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1))
    pipe = DiffFoleyPipeline(ldm, params, vae_params, mesh=mesh)
    engine = BatchingEngine(
        pipe, GenerationConfig(steps=4, sample_num=1, gl_iters=4,
                               classifier_scale=0.0, return_spec=False),
        max_batch_windows=max(BUCKETS),
    )

    t0 = time.time()
    report = engine.aot_warmup(buckets=BUCKETS, cache_dir=cache_dir)
    warm_s = time.time() - t0
    feats = np.random.default_rng(0).normal(
        size=(4 * WINDOW_FEATS, 512)).astype(np.float32)
    wav = engine.submit(feats, timeout=3000.0)
    engine.stop()
    out = {
        "role": role,
        "devices": N_DEV, "mesh": f"data{N_DATA}",
        "aot_warmup_s": round(warm_s, 1),
        "report": {str(k): list(v) for k, v in report.items()},
        "all_restored": all(kind == "loaded" for kind, _ in report.values()),
        "wav_checksum": float(np.asarray(wav, np.float64).sum()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)


def _spawn(role: str, cache_dir: str, out_path: str) -> None:
    env = dict(os.environ)
    env[_ROLE] = role
    env["_DFT_MESH_CACHE"] = cache_dir
    env["_DFT_MESH_OUT"] = out_path
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={N_DEV}".strip())
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, os.path.abspath(__file__)],
                   env=env, cwd=REPO, check=True, timeout=3600)


def orchestrate():
    import tempfile

    tmp = tempfile.mkdtemp(prefix="dft_mesh_restart_")
    cache = os.path.join(tmp, "aot")
    cold_p, warm_p = os.path.join(tmp, "cold.json"), os.path.join(tmp, "warm.json")
    _spawn("cold", cache, cold_p)
    _spawn("warm", cache, warm_p)
    cold = json.load(open(cold_p))
    warm = json.load(open(warm_p))
    assert not cold["all_restored"]
    assert warm["all_restored"], warm
    assert warm["wav_checksum"] == cold["wav_checksum"], (cold, warm)
    section = {
        "setup": f"{N_DATA}-device data mesh (8 emulated CPU devices), "
                 "mid-size LDM, buckets " + str(list(BUCKETS)),
        "cold_process_aot_warmup_s": cold["aot_warmup_s"],
        "fresh_process_restore_s": warm["aot_warmup_s"],
        "speedup": round(cold["aot_warmup_s"] / max(warm["aot_warmup_s"], 1e-9), 1),
        "all_buckets_restored_without_tracing": warm["all_restored"],
        "restored_output_bit_identical": True,
        "per_bucket": {"cold": cold["report"], "warm": warm["report"]},
    }
    out = os.path.join(REPO, "SERVING_r05.json")
    record = {}
    if os.path.exists(out):
        record = json.load(open(out))
    record["mesh_restart"] = section
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(section, indent=2))


def main():
    role = os.environ.get(_ROLE)
    if role in ("cold", "warm"):
        _phase(role, os.environ["_DFT_MESH_CACHE"], os.environ["_DFT_MESH_OUT"])
    else:
        orchestrate()


if __name__ == "__main__":
    main()
