"""Coverage for the small operational modules: SpecAugment statistics,
precision casting, XLA cost analysis/timing, compile cache, distributed
bootstrap fallback, the wav→mel preprocessing CLI, and the alignment
classifier training CLI (tiny, on the emulated mesh)."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_spec_augment_masks_stripes():
    from diff_foley_tpu.ops.spec_augment import spec_augment

    spec = jnp.ones((4, 64, 256))
    out = spec_augment(spec, jax.random.PRNGKey(0),
                       time_drop_width=32, time_stripes=2,
                       freq_drop_width=8, freq_stripes=2)
    out = np.asarray(out)
    assert out.shape == spec.shape
    assert ((out == 0) | (out == 1)).all()
    frac = 1 - out.mean()
    # 2 time stripes ≤32 wide of 256 + 2 freq stripes ≤8 of 64: expect some
    # masking but far from everything
    assert 0.01 < frac < 0.6
    # the zero set is exactly a union of full time columns and full mel rows
    # (out[m,t] = rowkeep[m]·colkeep[t] on an all-ones input)
    for b in range(out.shape[0]):
        rowkeep = out[b].max(axis=1)
        colkeep = out[b].max(axis=0)
        np.testing.assert_array_equal(out[b], np.outer(rowkeep, colkeep))


def test_cast_floating_preserves_ints():
    from diff_foley_tpu.utils.precision import cast_floating

    tree = {"w": jnp.ones((2, 2), jnp.float32), "n": jnp.ones((2,), jnp.int32)}
    out = cast_floating(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["n"].dtype == jnp.int32


def test_cost_analysis_and_timed_call():
    from diff_foley_tpu.utils.profiling import (
        cost_analysis, flops_per_second, timed_call,
    )

    def fn(a, b):
        return a @ b

    a = jnp.ones((128, 128))
    costs = cost_analysis(fn, a, a)
    # XLA counts 2*M*N*K flops for a matmul
    assert costs["flops"] == pytest.approx(2 * 128**3, rel=0.01)
    sec, out = timed_call(jax.jit(fn), a, a, iters=2)
    assert sec > 0 and np.isfinite(np.asarray(out)).all()
    stats = flops_per_second(fn, a, a, iters=2)
    assert stats["tflops_per_second"] > 0


def test_compile_cache_sets_config(tmp_path):
    from diff_foley_tpu.utils.compile_cache import enable_compile_cache

    path = enable_compile_cache(str(tmp_path / "xla"))
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_init_distributed_single_process_fallback(monkeypatch):
    from diff_foley_tpu.parallel.distributed import init_distributed, is_master

    monkeypatch.delenv("MASTER_ADDR", raising=False)
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    info = init_distributed()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1
    assert is_master() in (True, False)


def test_preprocess_audio_cli(tmp_path):
    from diff_foley_tpu.cli.preprocess_audio import main
    from diff_foley_tpu.utils.wav import write_wav

    wav_dir, out_dir = tmp_path / "wavs", tmp_path / "specs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a", "b", "c"):
        write_wav(str(wav_dir / f"{name}.wav"),
                  rng.uniform(-0.5, 0.5, 16000).astype(np.float32), 16000)
    main(["--wav-dir", str(wav_dir), "--out-dir", str(out_dir),
          "--seconds", "2.0", "--batch", "2"])
    specs = sorted(glob.glob(str(out_dir / "*_mel.npy")))
    assert len(specs) == 3
    s = np.load(specs[0])
    # 2 s at hop 256 → 125 frames, 128 mel bins, normalised into [0, 1]
    assert s.shape == (128, 125)
    assert np.isfinite(s).all() and 0.0 <= s.min() and s.max() <= 1.0


def test_train_classifier_cli(tmp_path):
    from diff_foley_tpu.cli.train_classifier import main

    d = tmp_path / "data"
    (d / "Train" / "audio_npy_spec").mkdir(parents=True)
    (d / "CAVP_feat" / "Train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = [f"v{i}" for i in range(16)]
    for i in ids:
        np.save(d / "Train" / "audio_npy_spec" / f"{i}_mel.npy",
                rng.uniform(0, 1, (128, 160)).astype(np.float32))
        np.savez(d / "CAVP_feat" / "Train" / f"{i}.npz",
                 feat=rng.normal(size=(10, 512)).astype(np.float32))
    (d / "Train.txt").write_text("\n".join(ids))

    logdir = str(tmp_path / "logs")
    main(["--data-dir", str(d), "--logdir", logdir, "--tiny",
          "--batch-size", "8", "--max-steps", "2", "--save-every", "2",
          "--log-every", "1", "--data-duration", "2.0",
          "--data-truncate", "16384"])
    assert glob.glob(os.path.join(logdir, "ckpt", "*"))
    with open(os.path.join(logdir, "results.jsonl")) as f:
        rows = [json.loads(x) for x in f]
    bces = [r["train/bce_loss"] for r in rows if "train/bce_loss" in r]
    accs = [r["train/acc"] for r in rows if "train/acc" in r]
    assert bces and np.isfinite(bces).all()
    assert accs and all(0.0 <= a <= 1.0 for a in accs)


def test_spec_augment_reference_distribution():
    """Round-2 review: widths ~ randint[0, drop_width) (high exclusive) and
    stripes can end anywhere up to the axis edge (start depends on the
    sampled width), matching aug_utils.py:42-43."""
    from diff_foley_tpu.ops.spec_augment import spec_augment

    spec = jnp.ones((64, 32, 128))
    near_tail_masked = False
    last_masked = False
    max_stripe = 0
    for s in range(20):
        out = np.asarray(spec_augment(
            spec, jax.random.PRNGKey(s),
            time_drop_width=8, time_stripes=2,
            freq_drop_width=8, freq_stripes=2,
        ))
        # time-stripe mask: columns zeroed across ALL mel bins (a single
        # mel row can also be zeroed by a freq stripe)
        t_mask = (out == 0).all(axis=1)  # (B, T)
        # max contiguous run per row ≤ 2*(drop_width-1) (two stripes)
        runs = np.diff(np.where(
            np.pad(t_mask, ((0, 0), (1, 1))).astype(int).reshape(-1) == 0
        )[0]) - 1
        if runs.size:
            max_stripe = max(max_stripe, int(runs.max()))
        near_tail_masked |= bool(t_mask[:, -2].any())
        last_masked |= bool(t_mask[:, -1].any())
    assert max_stripe <= 14, max_stripe  # 2 stripes x width ≤ 7 each
    # reference semantics: bgn < T - distance, so index T-2 is reachable
    # (bgn=T-2, distance=1) but the final index T-1 never is
    assert near_tail_masked, "stripes never reach T-2"
    assert not last_masked, "final index must never be masked (bgn < T-d)"
