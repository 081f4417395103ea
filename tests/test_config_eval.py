"""Config loader vs the shipped reference YAMLs + eval utilities."""
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
