"""Serving-under-load artifact (round-2 VERDICT weak/next #8): N concurrent
clients with mixed window counts against the BatchingEngine on the flagship
pipeline. Reports request latency p50/p95, bucket-hit rate (steady-state
recompiles must be zero), and batch occupancy. Writes SERVING_r05.json.

Round-3 weak #6: run TWICE to also record the warm-restart number an
operator actually cares about — the first run populates the persistent XLA
compile cache (cold warmup ~6 min), the second run's `warmup_s` is the
process-restart latency with a warm cache; it is merged into the artifact
as `warm_restart_warmup_s`.

Run ON the TPU, quiet machine:  python scripts/serving_load.py   # cold
                                python scripts/serving_load.py   # warm restart
"""
import dataclasses
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS
from diff_foley_tpu.serving import BatchingEngine
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from diff_foley_tpu.utils.precision import cast_floating

N_CLIENTS = 12
N_REQUESTS = 48
MAX_BATCH_WINDOWS = 16


def build_pipeline(key):
    set_attention_backend("pallas")
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    k1, k2, k3 = jax.random.split(key, 3)
    params = jax.jit(ldm.init_params)(k1)
    params = {"unet": cast_floating(params["unet"]), "cond": params["cond"]}
    vae_params = jax.jit(ldm.init_vae_params)(k2)
    clf_cfg = dataclasses.replace(CLASSIFIER_BACKBONE, dtype="bfloat16")
    clf = ClassifierBackbone(clf_cfg)
    clf_params = cast_floating(jax.jit(lambda k: clf.init(
        k, jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)), jnp.zeros((1, 40, 512)),
    ))(k3))
    return DiffFoleyPipeline(ldm, params, vae_params,
                             classifier=(clf.apply, clf_params),
                             vae_dtype="bfloat16")


def main():
    enable_compile_cache()
    pipe = build_pipeline(jax.random.PRNGKey(0))
    engine = BatchingEngine(
        pipe, max_batch_windows=MAX_BATCH_WINDOWS, max_wait_ms=30.0
    )

    # instrument _run to record every executed (bucket, windows, requests)
    runs = []
    orig_run = engine._run

    def traced_run(batch):
        n_windows = sum(r.feats.shape[0] for r in batch)
        bucket = engine._bucket(n_windows, engine.max_windows)
        runs.append({"bucket": bucket, "windows": n_windows,
                     "requests": len(batch), "t": time.time()})
        return orig_run(batch)

    engine._run = traced_run

    rng = np.random.default_rng(0)

    def feats(w):
        return rng.normal(size=(w * WINDOW_FEATS, 512)).astype(np.float32)

    # ---- warmup: build or RESTORE every bucket the load phase can hit -----
    # aot_warmup persists serialized executables: the first process traces
    # + compiles (slow), every later process restores in seconds — the
    # restart latency an operator actually cares about
    t0 = time.time()
    aot_report = engine.aot_warmup()
    aot_s = time.time() - t0
    aot_loaded = all(kind == "loaded" for kind, _ in aot_report.values())
    for b in (1, 2, 4, 8, 16):
        engine.submit(feats(b), timeout=3000.0)
    warm_s = time.time() - t0
    warm_buckets = {r["bucket"] for r in runs}
    runs.clear()

    # ---- timed load phase: N_CLIENTS concurrent, mixed window counts ------
    window_choices = [1, 1, 2, 2, 3, 4]  # skewed small, like real clips
    latencies = []
    lat_lock = threading.Lock()
    work = list(rng.choice(window_choices, size=N_REQUESTS))
    work_lock = threading.Lock()

    def client():
        while True:
            with work_lock:
                if not work:
                    return
                w = int(work.pop())
            f = feats(w)
            t0 = time.time()
            wav = engine.submit(f, timeout=600.0)
            dt = time.time() - t0
            assert np.isfinite(wav).all()
            with lat_lock:
                latencies.append((w, dt))
            time.sleep(float(rng.uniform(0.0, 0.2)))

    t_load = time.time()
    threads = [threading.Thread(target=client) for _ in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    load_s = time.time() - t_load
    engine.stop()

    lats = np.array([d for _, d in latencies])
    total_windows = sum(w for w, _ in latencies)
    occ = np.array([r["windows"] / r["bucket"] for r in runs])
    new_buckets = {r["bucket"] for r in runs} - warm_buckets
    record = {
        "operating_point": (
            f"flagship bf16+Pallas, CFG4.5+CG50, 25 steps, "
            f"{N_CLIENTS} concurrent clients, {N_REQUESTS} requests, "
            f"windows drawn from {sorted(set(window_choices))}"
        ),
        "requests": len(latencies),
        "total_windows": int(total_windows),
        "load_wall_s": round(load_s, 2),
        "clips_per_min_under_load": round(total_windows / load_s * 60.0, 1),
        "latency_p50_s": round(float(np.percentile(lats, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lats, 95)), 3),
        "latency_max_s": round(float(lats.max()), 3),
        "device_batches": len(runs),
        "mean_batch_occupancy": round(float(occ.mean()), 3),
        "mean_requests_per_batch": round(
            float(np.mean([r["requests"] for r in runs])), 2),
        "steady_state_recompiles": len(new_buckets),
        "buckets_used": sorted({r["bucket"] for r in runs}),
        "warmup_s": round(warm_s, 1),
        "aot_warmup_s": round(aot_s, 1),
        "aot_report": {str(k): list(v) for k, v in aot_report.items()},
        "aot_all_restored": aot_loaded,
    }
    out = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "SERVING_r05.json"))
    if os.path.exists(out):
        # second run with the compile cache populated: keep the cold-run
        # load-phase numbers, record this run's warmup as the warm-restart
        # figure (plus its own load numbers for cross-checking)
        with open(out) as f:
            prev = json.load(f)
        prev["warm_restart_warmup_s"] = record["warmup_s"]
        prev["warm_restart_aot_warmup_s"] = record.get("aot_warmup_s")
        prev["warm_restart_aot_all_restored"] = record.get("aot_all_restored")
        prev["warm_restart_clips_per_min_under_load"] = record[
            "clips_per_min_under_load"]
        prev["warm_restart_latency_p50_s"] = record["latency_p50_s"]
        prev["warm_restart_steady_state_recompiles"] = record[
            "steady_state_recompiles"]
        record = prev
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
