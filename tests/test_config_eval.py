"""Config loader vs the shipped reference YAMLs + eval utilities."""
import json

import numpy as np
import pytest

from diff_foley_tpu.config import instantiate_from_config, load_yaml, load_ldm_from_yaml
from diff_foley_tpu.eval.spec_transform import (
    spec_16k128_to_22k80,
    spec_22k80_to_16k128,
)

REF_LDM_YAML = "/root/reference/inference/config/Stage2_LDM.yaml"
REF_CLF_YAML = "/root/reference/inference/config/Double_Guidance_Classifier.yaml"


def test_load_reference_stage2_yaml():
    ldm = load_ldm_from_yaml(REF_LDM_YAML)
    assert ldm.cfg.unet.model_channels == 320
    assert ldm.cfg.unet.channel_mult == (1, 2, 4, 4)
    assert ldm.cfg.unet.context_dim == 768
    assert ldm.cfg.vae.ch_mult == (1, 2, 4, 4)
    assert ldm.cfg.cond_embed_dim == 768
    assert ldm.cfg.cond_seq_len == 40
    assert ldm.cfg.scale_factor == 0.18215
    assert ldm.cfg.linear_start == 0.00085


def test_load_reference_classifier_yaml():
    cfg = load_yaml(REF_CLF_YAML)
    clf_cfg = instantiate_from_config(cfg["model"]["params"]["classifier_config"])
    assert clf_cfg.model_channels == 128
    assert clf_cfg.channel_mult == (1, 2, 2)
    assert clf_cfg.context_dim == 512
    assert clf_cfg.out_channels == 1


def test_unknown_target_raises():
    with pytest.raises(KeyError):
        instantiate_from_config({"target": "no.such.Thing", "params": {}})


def test_spec_transform_shapes_and_range():
    spec = np.random.default_rng(0).uniform(0.2, 0.8, size=(128, 512)).astype(
        np.float32
    )
    out = spec_16k128_to_22k80(spec)
    assert out.shape[0] == 80
    # T scales by 22050/16000
    assert abs(out.shape[1] - 512 * 22050 / 16000) < 3
    assert out.min() >= 0.0 and out.max() <= 1.0
    back = spec_22k80_to_16k128(out)
    assert back.shape[0] == 128


def test_run_config_roundtrip(tmp_path):
    """config_to_dict/config_from_dict + save/load_run_config: the JSON a
    training CLI writes rebuilds the exact nested config tree (tuples and
    Optional fields survive the JSON round trip)."""
    from diff_foley_tpu.config import (
        config_from_dict,
        config_to_dict,
        load_run_config,
        save_run_config,
    )
    from diff_foley_tpu.diffusion.latent_diffusion import LDMConfig
    from diff_foley_tpu.models.cavp.cavp import CAVPConfig
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.train.stage1_cavp import Stage1TrainConfig

    ldm_cfg = LDMConfig(
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                        attention_resolutions=(2,), context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        cond_embed_dim=24,
    )
    assert config_from_dict(
        LDMConfig, json.loads(json.dumps(config_to_dict(ldm_cfg)))
    ) == ldm_cfg

    cavp_cfg = CAVPConfig(video_stage_blocks=(1, 1, 1, 1),
                          spec_channels=(8,) * 6, dtype=None)
    assert config_from_dict(
        CAVPConfig, json.loads(json.dumps(config_to_dict(cavp_cfg)))
    ) == cavp_cfg

    save_run_config(str(tmp_path), "stage1_cavp", model=cavp_cfg,
                    train=Stage1TrainConfig(grad_clip=None),
                    init_video_shape=[1, 16, 16, 16, 3])
    meta = load_run_config(str(tmp_path), "stage1_cavp")
    assert config_from_dict(CAVPConfig, meta["model"]) == cavp_cfg
    assert meta["init_video_shape"] == [1, 16, 16, 16, 3]
    with pytest.raises(ValueError):
        load_run_config(str(tmp_path), "stage2_ldm")
    with pytest.raises(FileNotFoundError):
        load_run_config(str(tmp_path / "nope"))


def test_transform_spec_cli_folder_split(tmp_path):
    """The batch CLI mirrors the reference's folder walk + node sharding
    (transform_spec.py:93-130): node k of `split` converts a contiguous
    chunk; the union over nodes covers every file exactly once."""
    from diff_foley_tpu.cli import transform_spec as cli

    rng = np.random.default_rng(1)
    src = tmp_path / "gen"
    src.mkdir()
    for i in range(5):
        np.save(src / f"clip_{i}.npy",
                rng.uniform(0.2, 0.8, size=(128, 64)).astype(np.float32))
    (src / "notes.txt").write_text("ignored")  # non-npy files are skipped

    out = tmp_path / "conv"
    for node in range(2):
        rc = cli.main(["--input", str(src), "--output", str(out),
                       "--split", "2", "--node", str(node)])
        assert rc == 0
    names = sorted(p.name for p in out.glob("*.npy"))
    assert names == [f"clip_{i}.npy" for i in range(5)]
    converted = np.load(out / "clip_0.npy")
    ref = spec_16k128_to_22k80(np.load(src / "clip_0.npy"))
    np.testing.assert_allclose(converted, ref, atol=0)
    assert converted.shape[0] == 80

    # inverse direction lands back on the native geometry
    back = tmp_path / "back"
    rc = cli.main(["--input", str(out), "--output", str(back),
                   "--direction", "to_native"])
    assert rc == 0
    assert np.load(back / "clip_0.npy").shape[0] == 128

    with pytest.raises(SystemExit):
        cli.main(["--input", str(src), "--output", str(out),
                  "--split", "2", "--node", "2"])
