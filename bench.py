"""Headline benchmark: end-to-end 8-second-clip generation throughput.

Measures the full shipped inference operating point on one chip:
25-step DPM-Solver++(2M) with CFG 4.5 + alignment-classifier double guidance
(scale 50), flagship 860M UNet, VAE decode, batched on-device Griffin-Lim.

Prints ONE JSON line with the headline metric plus attribution fields
(round-1 VERDICT weak #7/#8): UNet fwd ms + MFU%, per-stage breakdown
(sampler / VAE decode / Griffin-Lim), and the flagship TRAINING step
throughput (the reference's dominant workload):
  {"metric": "clips_per_min_per_chip", "value": N, "unit": "clips/min",
   "vs_baseline": N/30, "unet_fwd_ms": ..., "unet_mfu_pct": ...,
   "sampler_s": ..., "vae_decode_ms": ..., "griffin_lim_ms": ...,
   "train_step_ms": ..., "train_samples_per_s": ...}
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
from diff_foley_tpu.models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS
from diff_foley_tpu.utils.precision import cast_floating

CLIPS = 32  # 8.192-s clips generated per timed run.
# Batch sweep on the real chip (clips/min): 16→545, 32→567, 64→555.
# 32 amortizes the per-program fixed cost without hitting the HBM knee.


def build_pipeline(key):
    set_attention_backend("pallas")  # fused attention kernel
    # GroupNorm stays on the XLA backend: the fused Pallas GN
    # (ops/pallas_groupnorm.py) measured 0.94x on the flagship UNet —
    # ~54 custom-call launches per forward cost more than the saved
    # HBM pass (see PROFILE_r03.json "experiments").
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # jit the inits: one compiled program each instead of thousands of
    # eager op dispatches, each paying the ~30 ms relay round trip
    params = jax.jit(ldm.init_params)(k1)
    params = {"unet": cast_floating(params["unet"]), "cond": params["cond"]}
    vae_params = jax.jit(ldm.init_vae_params)(k2)

    clf_cfg = dataclasses.replace(CLASSIFIER_BACKBONE, dtype="bfloat16")
    clf = ClassifierBackbone(clf_cfg)
    clf_params = jax.jit(lambda k: clf.init(
        k, jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 40, 512)),
    ))(k3)
    clf_params = cast_floating(clf_params)

    classifier = (clf.apply, clf_params)
    # vae_dtype: bf16 first-stage decode measured 1.14-1.19x over fp32 on
    # the real chip (max|Δ| 0.04 on [0,1] specs — inside the bf16 envelope,
    # PARITY_FLAGSHIP.json)
    return DiffFoleyPipeline(ldm, params, vae_params, classifier=classifier,
                             vae_dtype="bfloat16")


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (MXU)


# canonical relay-aware timing harnesses (docs/PERFORMANCE.md §2):
# _timed includes one dispatch+readback round trip; _timed_chained
# amortizes it across a dependent chain with one readback.
from diff_foley_tpu.utils.profiling import (  # noqa: E402
    timed_chained as _timed_chained,
    timed_dispatch as _timed,
)


def bench_components(pipe, extras):
    """UNet fwd / MFU + per-stage timings at the headline operating point."""
    ldm = pipe.ldm
    params = pipe.params
    b = CLIPS  # sampler batch (1 sample/window)
    x = jnp.zeros((b, 16, 64, 4), jnp.bfloat16)
    t = jnp.zeros((b,), jnp.float32)
    ctx = jnp.zeros((b, WINDOW_FEATS, 768), jnp.bfloat16)

    unet_fwd = jax.jit(
        lambda p, x_, t_, c_: ldm.unet.apply(p["unet"], x_, t_, c_)
    )
    dt = _timed_chained(
        lambda x_: unet_fwd(params, x_.astype(jnp.bfloat16), t, ctx), x
    )
    extras["unet_fwd_ms"] = round(dt * 1e3, 2)
    extras["dispatch_ms"] = round(
        max(0.0, _timed(unet_fwd, params, x, t, ctx) - dt) * 1e3, 1
    )  # relay round-trip latency a single dispatch pays on top (clamped:
    # it is the difference of two independently-measured medians)
    try:
        costs = jax.jit(
            lambda p, x_, t_, c_: ldm.unet.apply(p["unet"], x_, t_, c_)
        ).lower(params, x, t, ctx).compile().cost_analysis()
        flops = costs.get("flops", 0.0)
        extras["unet_mfu_pct"] = round(100.0 * flops / dt / V5E_BF16_PEAK, 1)
    except Exception:
        extras["unet_mfu_pct"] = None

    vdt = pipe.vae_compute or jnp.float32
    dec = jax.jit(lambda vp, z: ldm.decode_first_stage(vp, z.astype(vdt)))
    extras["vae_decode_ms"] = round(
        _timed(dec, pipe.vae_params, jnp.zeros((b, 16, 64, 4))) * 1e3, 1
    )
    gen = GenerationConfig(sample_num=1, return_spec=False)
    specs = jnp.zeros((b, 128, 512))
    extras["griffin_lim_ms"] = round(
        _timed(lambda s: pipe._invert(s, jax.random.PRNGKey(0), gen), specs)
        * 1e3, 1,
    )


def bench_train_step(extras):
    """Flagship stage-2 training step — the reference's dominant workload
    (launch.sh 8×220 batch) — at the production operating point: bf16
    mixed precision (fp32 masters, compute_dtype="bfloat16") with remat
    OFF. bf16 halves activation memory, so batch 32 fits without
    checkpointing. Sweep (real v5e, samples/s): fp32+remat 83.3@32;
    bf16+remat 98.4@32, 103.6@48, 103.2@64; bf16 no-remat 105.0@32
    (48 OOMs). Winner: bf16 no-remat @32."""

    from diff_foley_tpu.train.stage2_ldm import (
        Stage2TrainConfig,
        init_train_state,
        make_train_step,
    )

    batch_size = 32
    ldm = LatentDiffusion(LDMConfig())
    tcfg = Stage2TrainConfig(mu_dtype="bfloat16", compute_dtype="bfloat16")
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(
        jax.random.PRNGKey(0)
    )
    vae_params = jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1))
    batch = {
        "spec": jnp.zeros((batch_size, 128, 512, 3)),
        "video_feat": jnp.zeros((batch_size, 40, 512)),
    }
    step = jax.jit(make_train_step(ldm, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)

    state, metrics = step(state, vae_params, batch, rng)  # compile
    _ = float(metrics["loss"])
    times = []
    for _i in range(5):
        t0 = time.time()
        state, metrics = step(state, vae_params, batch, rng)
        _ = float(metrics["loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    extras["train_step_ms"] = round(dt * 1e3, 1)
    extras["train_samples_per_s"] = round(batch_size / dt, 2)

    # training-step MFU: fwd+bwd FLOPs from XLA cost analysis over the
    # measured step time (anchors samples/s to the hardware peak)
    try:
        # .lower on the same jitted fn hits the already-compiled executable
        costs = step.lower(state, vae_params, batch, rng).compile().cost_analysis()
        flops = costs.get("flops", 0.0)
        extras["train_mfu_pct"] = round(100.0 * flops / dt / V5E_BF16_PEAK, 1)
    except Exception:
        extras["train_mfu_pct"] = None

    try:
        bench_fed_train(extras, ldm, tcfg, step, state, vae_params, batch_size)
    except Exception as e:
        extras["fed_train_error"] = str(e)[:200]


def bench_cavp_train(extras):
    """Stage-1 CAVP training — the reference's dominant workload
    (launch_script.sh: 567,980 samples/epoch × 300 epochs) — device-only
    AND fed from the C++ shard reader (round-3 VERDICT weak #3).

    Operating point: shipped towers (SlowOnly-R50 × CNN14), batch 8 videos
    × clip_num 3 = 24 clips/step, --mixed-precision (bf16 towers, fp32
    masters). Fed path: native tar reader → threaded JPEG decode
    (decode_workers) → intra-contrast crops → bf16 host cast → H2D overlap
    (DevicePrefetcher) → jit step."""
    import tempfile

    from diff_foley_tpu.data.cavp_shards import CAVPShardConfig
    from diff_foley_tpu.data.loader import DevicePrefetcher
    from diff_foley_tpu.data.native_loader import iter_shards_native
    from diff_foley_tpu.data.synthetic import write_cavp_shards
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.train.stage1_cavp import (
        Stage1TrainConfig,
        init_train_state,
        make_train_step,
    )

    B, CLIP = 8, 3
    model = CAVPModel(CAVPConfig())
    tcfg = Stage1TrainConfig(clip_num=CLIP, compute_dtype="bfloat16")
    state = jax.jit(
        lambda k: init_train_state(
            model, k, tcfg,
            video_shape=(1, 16, 224, 224, 3), spec_shape=(1, 128, 256),
        )
    )(jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    # ---- device-only: zeros batch -----------------------------------------
    batch = {
        "video": jnp.zeros((B, CLIP, 16, 224, 224, 3), jnp.bfloat16),
        "spec": jnp.zeros((B, CLIP, 128, 256), jnp.bfloat16),
    }
    state, metrics = step(state, batch, rng)  # compile
    _ = float(metrics["total_loss"])
    times = []
    for _i in range(5):
        t0 = time.time()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total_loss"])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    extras["cavp_train_step_ms"] = round(dt * 1e3, 1)
    extras["cavp_clips_per_s"] = round(B * CLIP / dt, 1)

    # ---- fed: C++ reader → threaded decode → H2D overlap → step -----------
    shard_dir = tempfile.gettempdir() + "/diff_foley_bench_shards"
    import os as _os

    if not _os.path.exists(shard_dir + "/shard-000003.tar"):
        write_cavp_shards(shard_dir, n_shards=4, items_per_shard=16,
                          frame_size=224, seed=0)
    shards = sorted(
        _os.path.join(shard_dir, f) for f in _os.listdir(shard_dir)
        if f.endswith(".tar")
    )
    # uint8 video over the link, /255 on device: the fed path is
    # H2D-transfer-bound (see relay_h2d_MBps below), so halving the video
    # bytes vs bf16 directly scales fed throughput
    scfg = CAVPShardConfig(clip_num=CLIP, shift_lb=8, uint8_video=True)

    # the link itself, for attribution: one 64 MB device_put + readback
    blob = np.zeros((64, 1024, 1024), np.uint8)
    t0 = time.time()
    _ = jax.device_put(blob).sum().item()
    extras["relay_h2d_MBps"] = round(64 / (time.time() - t0), 1)

    def batches(epoch):
        buf_v, buf_s = [], []
        for s in iter_shards_native(
            shards, seed=0, epoch=epoch, cfg=scfg,
            decode_workers=8, shuffle_buffer=16,
        ):
            buf_v.append(s["video"])
            buf_s.append(s["spec"])
            if len(buf_v) == B:
                # video stays uint8 (DevicePrefetcher passes non-f32
                # through); spec fp32 → bf16 on host
                yield {"video": np.stack(buf_v), "spec": np.stack(buf_s)}
                buf_v, buf_s = [], []

    # loader-only steady state: C++ tar reader + threaded JPEG decode +
    # collate, NO device work — substantiates (or refutes) the claim that
    # the fed gap is purely the dev-tunnel link: on a real TPU VM the fed
    # rate is min(this, device rate). Epoch 0 warms thread pool/page cache.
    for _b in batches(0):
        pass
    n_l, t0 = 0, time.time()
    for _b in batches(1):
        n_l += B * CLIP
    extras["cavp_loader_clips_per_s"] = round(n_l / (time.time() - t0), 1)

    warmup, timed_steps, n, i = 2, 0, 0, 0
    t0 = None
    for epoch in range(4):  # 64 items / 8 = 8 steps per epoch
        for batch in DevicePrefetcher(batches(epoch), cast_dtype="bfloat16"):
            state, metrics = step(state, batch, rng)
            i += 1
            if i == warmup:
                _ = float(metrics["total_loss"])
                t0 = time.time()
            elif i > warmup:
                timed_steps += 1
                n += B * CLIP
    if t0 is not None and timed_steps:
        _ = float(metrics["total_loss"])
        dt = time.time() - t0
        extras["cavp_fed_clips_per_s"] = round(n / dt, 1)
        extras["cavp_fed_steps"] = timed_steps


def _make_synthetic_ldm_data(root, n_items: int):
    """Synthetic on-disk dataset in the reference layout
    (video_spec_dataset.py:40-52): 10-s mel specs + 4-FPS CAVP features."""
    import os

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    spec_paths, feat_paths = [], []
    for i in range(n_items):
        sp = f"{root}/{i}_mel.npy"
        fp = f"{root}/{i}.npz"
        if not (os.path.exists(sp) and os.path.exists(fp)):
            np.save(sp, rng.uniform(size=(128, 625)).astype(np.float32))
            np.savez(fp, feat=rng.normal(size=(40, 512)).astype(np.float32))
        spec_paths.append(sp)
        feat_paths.append(fp)
    return spec_paths, feat_paths


def bench_fed_train(extras, ldm, tcfg, step, state, vae_params, batch_size):
    """The FED training loop: the flagship step driven by the real host data
    pipeline (SpecFeatDataset crop/concat-mix augmentation + threaded
    PrefetchLoader) over synthetic on-disk npy/npz — the reference's dominant
    workload incl. its data path (launch.sh; train_wds_intra_contrast.py
    data-time meters). Reports steady-state fed_train_samples_per_s next to
    the zeros-batch number, plus the loader-only rate for attribution."""
    import tempfile

    from diff_foley_tpu.data.ldm_dataset import SpecFeatDataset
    from diff_foley_tpu.data.loader import PrefetchLoader

    from diff_foley_tpu.data.ldm_dataset import LDMDataConfig

    tmp = tempfile.gettempdir() + "/diff_foley_bench_data"
    spec_paths, feat_paths = _make_synthetic_ldm_data(tmp, 256)
    # tile_channels=False: single-channel specs over the host→device link,
    # ×3 tiling on device (the transfer is the fed loop's bottleneck)
    ds = SpecFeatDataset(spec_paths, feat_paths,
                         LDMDataConfig(tile_channels=False))
    loader = PrefetchLoader(ds, batch_size, num_workers=8, prefetch=6)

    # loader-only steady-state rate (pure host pipeline, no device work).
    # Epoch 0 is a warmup: the first epoch inside a jax-active process runs
    # ~8× slower (thread-pool/page-cache warmup) and is not steady state.
    for b in loader.epoch(0):
        pass
    n_loader = 0
    t0 = time.time()
    for b in loader.epoch(9):
        n_loader += b["spec"].shape[0]
    loader_dt = time.time() - t0
    extras["loader_samples_per_s"] = round(n_loader / loader_dt, 1)

    from diff_foley_tpu.data.loader import DevicePrefetcher

    rng = jax.random.PRNGKey(3)
    warmup, timed_steps, n, i = 2, 0, 0, 0
    t0 = None
    last_metrics = None
    cast = "bfloat16" if tcfg.compute_dtype == "bfloat16" else None
    for epoch in range(1, 8):  # 256/32 = 8 steps/epoch → ~54 total
        # host-side bf16 cast halves relay bytes; the background feeder
        # overlaps the H2D transfer of batch k+1 with the step on batch k
        for batch in DevicePrefetcher(loader.epoch(epoch), cast_dtype=cast):
            state, last_metrics = step(state, vae_params, batch, rng)
            i += 1
            # interval readback (the trainer's log_every cadence): per-step
            # loss readbacks would serialize H2D against compute
            if i % 8 == 0:
                _ = float(last_metrics["loss"])
            if i == warmup:
                _ = float(last_metrics["loss"])  # drain before the clock
                t0 = time.time()
            elif i > warmup:
                timed_steps += 1
                n += batch_size
    if t0 is not None and timed_steps:
        _ = float(last_metrics["loss"])  # force completion of the tail
        dt = time.time() - t0
        extras["fed_train_samples_per_s"] = round(n / dt, 2)
        extras["fed_train_steps"] = timed_steps


def main():
    import gc

    from diff_foley_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # the shipped operating point everywhere, training included: Pallas
    # attention fwd + the chunked Pallas backward (train step 306 → 273 ms,
    # PROFILE_r03.json attn_bwd_ab). Previously only build_pipeline set
    # this, so the train bench silently ran XLA attention.
    set_attention_backend("pallas")
    extras_train = {}
    # train step FIRST, while HBM is clean: batch 32 (the single-chip
    # sweet spot) does not fit alongside the resident inference pipeline
    try:
        bench_train_step(extras_train)
    except Exception as e:
        extras_train["train_error"] = str(e)[:200]
    jax.clear_caches()
    gc.collect()

    # stage-1 CAVP train (device-only + fed), then free its HBM too
    try:
        bench_cavp_train(extras_train)
    except Exception as e:
        extras_train["cavp_train_error"] = str(e)[:200]
    jax.clear_caches()
    gc.collect()

    pipe = build_pipeline(jax.random.PRNGKey(0))
    # 1 sample per window; CLIPS windows; serving mode (wav-only readback,
    # int16 PCM packed on device: write_wav-exact quantization at half the
    # relay bytes — the fp32 bulk readback measured 15% of generate() wall)
    gen = GenerationConfig(sample_num=1, return_spec=False,
                           wav_dtype="int16")
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

    extras = {"sampler_s": round(dt, 3)}
    try:
        bench_components(pipe, extras)
    except Exception as e:  # keep the headline metric robust
        extras["component_error"] = str(e)[:200]
    extras.update(extras_train)

    print(
        json.dumps(
            {
                "metric": "clips_per_min_per_chip",
                "value": round(clips_per_min, 2),
                "unit": "clips/min",
                "vs_baseline": round(clips_per_min / 30.0, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
