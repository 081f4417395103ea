"""End-to-end smoke of the stage-2 training CLI on the 8-device CPU mesh.

Covers the full driver loop the reference exercises via Lightning
(`training/stage2_ldm/main.py` + launch.sh): dataset from the reference's
directory layout, FSDP-sharded train state, validation monitoring, SoundLogger
artifacts, periodic checkpointing, and `--resume` continuing from the saved
step.
"""
import glob
import json
import os

import numpy as np
import pytest

from diff_foley_tpu.cli.train_stage2 import main


@pytest.fixture()
def data_dir(tmp_path):
    d = tmp_path / "data"
    (d / "Train" / "audio_npy_spec").mkdir(parents=True)
    (d / "CAVP_feat" / "Train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = [f"v{i}" for i in range(16)]
    for i in ids:
        np.save(
            d / "Train" / "audio_npy_spec" / f"{i}_mel.npy",
            rng.uniform(0, 1, (128, 160)).astype(np.float32),
        )
        np.savez(
            d / "CAVP_feat" / "Train" / f"{i}.npz",
            feat=rng.normal(size=(10, 512)).astype(np.float32),
        )
    (d / "Train.txt").write_text("\n".join(ids))
    return str(d)


def test_train_cli_fsdp_resume_soundlog(data_dir, tmp_path):
    logdir = str(tmp_path / "logs")
    common = [
        "--data-dir", data_dir, "--logdir", logdir,
        "--tiny", "--fsdp", "--batch-size", "8",
        "--data-duration", "2.0", "--data-truncate", "16384",
        "--log-every", "1", "--save-every", "3",
        "--val-every", "2", "--val-batches", "1",
        "--sound-log-every", "3", "--use-ema", "--mixed-precision",
    ]
    main(common + ["--max-steps", "3"])

    # checkpoint written at step 3
    assert glob.glob(os.path.join(logdir, "ckpt", "*")), "no checkpoint saved"
    # JSONL metrics with train + val entries
    with open(os.path.join(logdir, "results.jsonl")) as f:
        rows = [json.loads(x) for x in f]
    assert any("train/loss" in r for r in rows)
    assert any(any(k.startswith("val/") for k in r) for r in rows)
    losses = [r["train/loss"] for r in rows if "train/loss" in r]
    assert np.isfinite(losses).all()
    # SoundLogger artifacts at step 3: gt / rec / sample wavs + specs
    sound = glob.glob(os.path.join(logdir, "sound", "step_*", "sample_0.wav"))
    assert sound, "SoundLogger wrote no sample wav"
    gt_spec = glob.glob(os.path.join(logdir, "sound", "step_*", "gt_spec.npy"))
    assert gt_spec and np.isfinite(np.load(gt_spec[0])).all()

    # resume continues from step 3 to step 5
    main(common + ["--max-steps", "5", "--resume"])
    with open(os.path.join(logdir, "results.jsonl")) as f:
        rows = [json.loads(x) for x in f]
    steps = [r["step"] for r in rows if "train/loss" in r]
    assert max(steps) == 5
    assert 4 in steps and 5 in steps, f"resume did not continue: {steps}"
