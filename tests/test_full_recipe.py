"""The whole Diff-Foley recipe, end to end, through the user-facing CLIs:

  stage-1 CAVP contrastive training   (cli.train_cavp, webdataset shards)
      → native CAVP checkpoint encodes video features
  stage-2 LDM training                (cli.train_stage2, spec+feat data dir)
  stage-4 alignment classifier        (cli.train_classifier, same data dir)
      → DiffFoley.from_native_checkpoints assembles inference from the
        three logdirs alone
      → generate with CFG + double guidance
      → align_acc scores the generated specs with the SAME trained
        CAVP features + classifier

This is the reference's full published workflow (SURVEY.md §3: launch_script
→ main_wds_intra_contrast; extract_cavp_features; stage2_main; inference
notebook; evaluation/align_acc.py) executed as ONE composed run on tiny
geometry — proving the framework's stages compose through its own
checkpoint surfaces, not just that each stage runs in isolation.
"""
import glob
import io
import json
import os
import tarfile

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

WINDOW_FEATS = 32          # 8.192 s at 4 fps
SPEC_FRAMES = 512          # 8.192 s at hop 256 / 16 kHz
N_ITEMS = 8


@pytest.fixture(scope="module")
def recipe(tmp_path_factory):
    """Run the three trainings once; downstream tests share the logdirs."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("recipe")
    rng = np.random.default_rng(0)

    # ---- stage-1 data: webdataset shards (spec npy + frame-strip jpg) ----
    shard_dir = root / "shards"
    shard_dir.mkdir()
    for si in range(2):
        with tarfile.open(shard_dir / f"shard-{si:06d}.tar", "w") as tf:
            for k in range(4):
                spec = rng.uniform(size=(128, 640)).astype(np.float32)
                buf = io.BytesIO()
                np.save(buf, spec)
                info = tarfile.TarInfo(f"s{si}_{k}.spec.npy")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf.addfile(info, buf)
                strip = (rng.uniform(size=(16, 16 * 40, 3)) * 255).astype(
                    np.uint8
                )
                ok, enc = cv2.imencode(".jpg", strip)
                assert ok
                info = tarfile.TarInfo(f"s{si}_{k}.video.jpg")
                info.size = len(enc)
                tf.addfile(info, io.BytesIO(enc.tobytes()))

    # ---- stage 1: CAVP contrastive training --------------------------------
    from diff_foley_tpu.cli.train_cavp import main as train_cavp

    cavp_dir = str(root / "cavp")
    train_cavp([
        "--train-shards", str(shard_dir / "shard-{000000..000001}.tar"),
        "--logdir", cavp_dir, "--tiny",
        "--batch-size", "8", "--clip-num", "2",
        "--epochs", "2", "--steps-per-epoch", "1",
        "--log-every", "1", "--save-every-epochs", "1", "--warmup", "1",
    ])
    assert glob.glob(os.path.join(cavp_dir, "ckpt", "*"))

    # ---- the trained CAVP extracts features for stages 2/4 -----------------
    from diff_foley_tpu.utils.checkpoint import load_native_cavp

    cavp_model, cavp_vars = load_native_cavp(cavp_dir)
    import jax.numpy as jnp

    encode = jax.jit(
        lambda v, x: cavp_model.apply(
            v, x, method=lambda m, a: m.encode_video(
                a, normalize=True, pool=False, train=False
            ),
        )
    )
    data_dir = root / "data"
    (data_dir / "Train" / "audio_npy_spec").mkdir(parents=True)
    (data_dir / "CAVP_feat" / "Train").mkdir(parents=True)
    ids = [f"v{i}" for i in range(N_ITEMS)]
    for i in ids:
        np.save(
            data_dir / "Train" / "audio_npy_spec" / f"{i}_mel.npy",
            rng.uniform(0, 1, (128, SPEC_FRAMES)).astype(np.float32),
        )
        frames = rng.uniform(size=(1, WINDOW_FEATS, 16, 16, 3)).astype(
            np.float32
        )
        feat = np.asarray(encode(cavp_vars, jnp.asarray(frames)))[0]
        assert feat.shape[-1] == 512 and np.isfinite(feat).all()
        np.savez(
            data_dir / "CAVP_feat" / "Train" / f"{i}.npz",
            feat=feat.astype(np.float32),
        )
    (data_dir / "Train.txt").write_text("\n".join(ids))

    # ---- stage 2: LDM training (EMA on — inference prefers the shadow) -----
    from diff_foley_tpu.cli.train_stage2 import main as train_stage2

    ldm_dir = str(root / "ldm")
    train_stage2([
        "--data-dir", str(data_dir), "--logdir", ldm_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "2", "--use-ema",
        "--save-every", "2", "--log-every", "1", "--warmup-steps", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
    ])
    assert glob.glob(os.path.join(ldm_dir, "ckpt", "*"))
    assert glob.glob(os.path.join(ldm_dir, "vae", "*"))

    # ---- stage 4: double-guidance classifier --------------------------------
    from diff_foley_tpu.cli.train_classifier import main as train_classifier

    clf_dir = str(root / "classifier")
    train_classifier([
        "--data-dir", str(data_dir), "--logdir", clf_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "2", "--save-every", "2",
        "--log-every", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
    ])
    assert glob.glob(os.path.join(clf_dir, "ckpt", "*"))

    return {"cavp": cavp_dir, "ldm": ldm_dir, "classifier": clf_dir,
            "data": data_dir}


def test_run_configs_written(recipe):
    for kind, d in (("stage1_cavp", recipe["cavp"]),
                    ("stage2_ldm", recipe["ldm"]),
                    ("classifier", recipe["classifier"])):
        with open(os.path.join(d, "config.json")) as f:
            assert json.load(f)["kind"] == kind


def test_native_ldm_prefers_ema(recipe):
    from diff_foley_tpu.utils.checkpoint import load_native_ldm

    _, ema_params, _ = load_native_ldm(recipe["ldm"], prefer_ema=True)
    _, raw_params, _ = load_native_ldm(recipe["ldm"], prefer_ema=False)
    leaves_e = jax.tree_util.tree_leaves(ema_params)
    leaves_r = jax.tree_util.tree_leaves(raw_params)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_e, leaves_r)
    ), "EMA shadow should differ from live params after warmup-decay steps"


def test_generate_and_align_acc_from_native_checkpoints(recipe):
    """The composed machine: three native logdirs → guided generation →
    align-acc scored with the same trained classifier."""
    from diff_foley_tpu.api import DiffFoley
    from diff_foley_tpu.pipeline import GenerationConfig, WINDOW_SAMPLES

    df = DiffFoley.from_native_checkpoints(
        cavp=recipe["cavp"], ldm=recipe["ldm"],
        classifier=recipe["classifier"], bf16=False,
    )
    # frame_size defaults to the geometry the CAVP was trained at (recorded
    # in its config.json — the --tiny towers saw 16×16 frames)
    assert df.frame_size == 16
    feats = np.load(
        os.path.join(recipe["data"], "CAVP_feat", "Train", "v0.npz")
    )["feat"][:WINDOW_FEATS]
    gen = GenerationConfig(
        steps=2, sample_num=1, cfg_scale=4.5, classifier_scale=50.0,
        gl_iters=2, return_spec=True,
    )
    out = df.generate_from_features(feats, seed=0, gen=gen)
    assert out["wav"].shape == (1, WINDOW_SAMPLES)
    assert np.isfinite(out["wav"]).all()

    # classifier_context="encoded": guidance context through the trained
    # cond encoder (the training distribution) instead of the reference's
    # raw-feat quirk — must produce different, finite samples
    df_enc = DiffFoley.from_native_checkpoints(
        cavp=recipe["cavp"], ldm=recipe["ldm"],
        classifier=recipe["classifier"], bf16=False,
        classifier_context="encoded",
    )
    out_enc = df_enc.generate_from_features(feats, seed=0, gen=gen)
    assert np.isfinite(out_enc["wav"]).all()
    assert not np.array_equal(out_enc["wav"], out["wav"]), (
        "encoded-context guidance should steer differently from raw")
    spec = np.asarray(out["spec"])  # (1, 128, 512)
    assert spec.shape == (1, 128, SPEC_FRAMES)
    assert np.isfinite(spec).all()

    # align-acc protocol at t=0 with the natively trained classifier + the
    # ground-truth features (evaluation/align_acc.py flow); the frozen VAE
    # is the one the classifier run persisted alongside its checkpoints
    from diff_foley_tpu.eval.align_acc import make_align_acc_fn
    from diff_foley_tpu.utils.checkpoint import load_native_classifier

    trainer, cparams, vae_params = load_native_classifier(
        recipe["classifier"]
    )
    assert vae_params is not None
    fn = make_align_acc_fn(trainer, trainer.vae, vae_params)
    spec3 = np.repeat(spec[..., None], 3, axis=-1)
    feat_b = feats[None].astype(np.float32)
    correct, total = fn(
        cparams, spec3, feat_b, np.ones((1,), np.int32)
    )
    assert int(total) == 1 and int(correct) in (0, 1)


def test_generate_cli_accepts_native_logdirs(recipe, tmp_path):
    """cli.generate: every --*-ckpt flag takes a native training logdir in
    place of a reference torch checkpoint (video → wav, fully natively
    trained weights)."""
    cv2 = pytest.importorskip("cv2")
    video = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (64, 64))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(270):  # 9 s @ 30 fps ≥ one 8.192 s window at 4 fps
        w.write((rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8))
    w.release()

    from diff_foley_tpu.cli.generate import main

    out_dir = str(tmp_path / "out")
    main([
        "--video", video, "--out", out_dir,
        "--cavp-ckpt", recipe["cavp"], "--ldm-ckpt", recipe["ldm"],
        "--classifier-ckpt", recipe["classifier"],
        "--steps", "2", "--sample-num", "1", "--cg-scale", "50.0",
        "--frame-size", "16", "--truncate-second", "8.2",
    ])
    wavs = glob.glob(os.path.join(out_dir, "*.wav"))
    specs = glob.glob(os.path.join(out_dir, "*_spec.npy"))
    assert len(wavs) == 1 and len(specs) == 1
    s = np.load(specs[0])
    assert np.isfinite(s).all()

    # --continue-from: keep the first 2 s of the just-generated spec and
    # regenerate the rest (forces the masked DDIM path end-to-end)
    out_dir2 = str(tmp_path / "out_cont")
    main([
        "--video", video, "--out", out_dir2,
        "--cavp-ckpt", recipe["cavp"], "--ldm-ckpt", recipe["ldm"],
        "--classifier-ckpt", recipe["classifier"],
        "--steps", "2", "--sample-num", "1", "--cg-scale", "0.0",
        "--frame-size", "16", "--truncate-second", "8.2",
        "--continue-from", specs[0], "--known-seconds", "2.0",
    ])
    wavs2 = glob.glob(os.path.join(out_dir2, "*.wav"))
    specs2 = glob.glob(os.path.join(out_dir2, "*_spec.npy"))
    assert len(wavs2) == 1 and len(specs2) == 1
    s2 = np.load(specs2[0])
    assert np.isfinite(s2).all()
    # the kept prefix (2 s = 125 mel frames) must match the source spec
    # through the VAE canvas roundtrip far more closely than the free tail
    kept = np.abs(s2[:, :120] - s[:, :120]).mean()
    free = np.abs(s2[:, 200:] - s[:, 200:]).mean()
    assert kept < free, (kept, free)


def test_align_acc_cli_accepts_native_logdir(recipe, tmp_path):
    """cli.align_acc with a native classifier logdir: config, params, and
    the frozen VAE all come from the logdir (evaluation/align_acc.py flow)."""
    from diff_foley_tpu.cli.align_acc import main

    spec_dir, feat_dir = tmp_path / "specs", tmp_path / "feats"
    spec_dir.mkdir(), feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for n in ("a", "b", "c"):
        np.save(spec_dir / f"{n}.npy",
                rng.uniform(0, 1, (128, SPEC_FRAMES)).astype(np.float32))
        np.savez(feat_dir / f"{n}.npz",
                 feat=rng.normal(size=(40, 512)).astype(np.float32))
    out = str(tmp_path / "results_metric.txt")
    main(["--spec-dir", str(spec_dir), "--feat-dir", str(feat_dir),
          "--classifier-ckpt", recipe["classifier"], "--batch-size", "3",
          "--out", out])
    line = open(out).read().strip()
    acc = float(line.split(":")[1])
    assert 0.0 <= acc <= 1.0


def test_extract_features_cli_accepts_native_logdir(recipe, tmp_path):
    """cli.extract_features with a native stage-1 logdir reproduces the
    fixture's feature extraction (same trained towers → same features)."""
    cv2 = pytest.importorskip("cv2")
    video_dir, out_dir = tmp_path / "videos", tmp_path / "feats"
    video_dir.mkdir()
    v = str(video_dir / "clip.avi")
    w = cv2.VideoWriter(v, cv2.VideoWriter_fourcc(*"MJPG"), 4.0, (32, 32))
    assert w.isOpened()
    rng = np.random.default_rng(1)
    for _ in range(8):  # 2 s @ 4 fps
        w.write((rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
    w.release()

    from diff_foley_tpu.cli.extract_features import main

    # no --frame-size: the CLI reads the trained geometry (16) from the
    # logdir's config.json
    main(["--video-dir", str(video_dir), "--out-dir", str(out_dir),
          "--cavp-ckpt", recipe["cavp"]])
    feat = np.load(out_dir / "clip.npz")["feat"]
    assert feat.shape[-1] == 512 and np.isfinite(feat).all()
    # L2-normalised per-frame features (encode_video(normalize=True))
    np.testing.assert_allclose(
        np.linalg.norm(feat, axis=-1), 1.0, rtol=1e-4
    )


def test_train_vae_cli_and_native_vae_into_stage2(recipe, tmp_path):
    """cli.train_vae (G/D alternating step over spec images) produces a
    native VAE logdir that cli.train_stage2 --vae-ckpt consumes; the VAE the
    stage-2 run persists is bit-identical to the trained one (the full
    native chain: train_vae → train_stage2 → load_native_ldm)."""
    from diff_foley_tpu.cli.train_vae import main as train_vae

    vae_dir = str(tmp_path / "vae")
    train_vae([
        "--data-dir", str(recipe["data"]), "--logdir", vae_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "2", "--disc-start", "1",
        "--save-every", "2", "--log-every", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
    ])
    assert glob.glob(os.path.join(vae_dir, "ckpt", "*"))

    from diff_foley_tpu.utils.checkpoint import load_native_ldm, load_native_vae

    vae, vae_params = load_native_vae(vae_dir)
    # the restored weights reconstruct (sanity: finite, right shape)
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 128, 512, 3)), jnp.float32
    )
    rec, _ = vae.apply(vae_params, x)
    assert rec.shape == x.shape and np.isfinite(np.asarray(rec)).all()

    from diff_foley_tpu.cli.train_stage2 import main as train_stage2

    ldm2_dir = str(tmp_path / "ldm2")
    train_stage2([
        "--data-dir", str(recipe["data"]), "--logdir", ldm2_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "2",
        "--save-every", "2", "--log-every", "1", "--warmup-steps", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
        "--vae-ckpt", vae_dir,
    ])
    _, _, persisted = load_native_ldm(ldm2_dir)
    for a, b in zip(jax.tree_util.tree_leaves(vae_params),
                    jax.tree_util.tree_leaves(persisted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fresh (non-resume) re-run in the SAME logdir with a different first
    # stage: the persisted VAE must be refreshed, not silently kept stale
    train_stage2([
        "--data-dir", str(recipe["data"]), "--logdir", ldm2_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "2",
        "--save-every", "2", "--log-every", "1", "--warmup-steps", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
    ])
    _, _, refreshed = load_native_ldm(ldm2_dir)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(vae_params),
                        jax.tree_util.tree_leaves(refreshed))
    ), "persisted VAE should track the new run, not the previous one"


def test_native_vae_geometry_mismatch_is_loud(recipe, tmp_path):
    """load_native_vae(expect_cfg=...) fails with a useful error when the
    trained geometry differs from the consumer's (not a deep tree mismatch)."""
    from diff_foley_tpu.cli.train_vae import main as train_vae

    vae_dir = str(tmp_path / "vae_mismatch")
    train_vae([
        "--data-dir", str(recipe["data"]), "--logdir", vae_dir, "--tiny",
        "--batch-size", "8", "--max-steps", "1", "--disc-start", "1",
        "--save-every", "1", "--log-every", "1",
        "--data-duration", "8.192", "--data-truncate", "131072",
    ])
    from diff_foley_tpu.models.vae import SD_VAE
    from diff_foley_tpu.utils.checkpoint import load_native_vae

    with pytest.raises(ValueError, match="geometries must match"):
        load_native_vae(vae_dir, expect_cfg=SD_VAE)
