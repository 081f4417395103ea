"""Stage-1 CLI end-to-end smoke: train_cavp.main() over synthetic webdataset
shards with --tiny smoke towers + --mixed-precision, on the 8-device CPU
mesh (the reference's launch_script.sh → main_wds_intra_contrast flow)."""
import glob
import io
import json
import os
import tarfile

import numpy as np
import pytest

from diff_foley_tpu.cli.train_cavp import main


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    tmp = tmp_path_factory.mktemp("cavp_cli_shards")
    rng = np.random.default_rng(0)
    paths = []
    for si in range(2):
        p = tmp / f"shard-{si:06d}.tar"
        with tarfile.open(p, "w") as tf:
            for k in range(4):
                spec = rng.uniform(size=(128, 640)).astype(np.float32)
                buf = io.BytesIO()
                np.save(buf, spec)
                info = tarfile.TarInfo(f"s{si}_{k}.spec.npy")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf.addfile(info, buf)
                # 16×16 frames keep the tiny towers fast on CPU
                strip = (rng.uniform(size=(16, 16 * 40, 3)) * 255).astype(
                    np.uint8
                )
                ok, enc = cv2.imencode(".jpg", strip)
                info = tarfile.TarInfo(f"s{si}_{k}.video.jpg")
                info.size = len(enc)
                tf.addfile(info, io.BytesIO(enc.tobytes()))
        paths.append(str(p))
    return paths


def test_train_cavp_cli_tiny_mixed_precision(shards, tmp_path):
    logdir = str(tmp_path / "logs")
    main([
        "--train-shards", shards[0].rsplit("/", 1)[0] + "/shard-{000000..000001}.tar",
        "--logdir", logdir,
        "--tiny", "--mixed-precision",
        "--batch-size", "8", "--clip-num", "2",
        "--epochs", "2", "--steps-per-epoch", "1",
        "--log-every", "1", "--save-every-epochs", "1",
        "--warmup", "1",
    ])
    # JSONL metrics: one train row per step, finite losses
    with open(os.path.join(logdir, "results.jsonl")) as f:
        rows = [json.loads(x) for x in f]
    losses = [r["train/total_loss"] for r in rows if "train/total_loss" in r]
    assert len(losses) >= 2
    assert np.isfinite(losses).all()
    # checkpoints written (per-epoch + final)
    assert glob.glob(os.path.join(logdir, "ckpt", "*")), "no checkpoint"
