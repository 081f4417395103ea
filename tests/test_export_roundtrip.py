"""JAX→torch export round-trips bit-exactly through the converters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.models.unet import UNetConfig, UNetModel
from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.models.cond_encoder import VideoFeatEncoderPosembed
from diff_foley_tpu.utils.convert import (
    convert_cond_encoder,
    convert_unet,
    convert_vae,
    export_cond_encoder,
    export_ldm_state_dict,
    export_unet,
    export_vae,
    split_ldm_state_dict,
)

UCFG = UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                  attention_resolutions=(1, 2), num_heads=4, context_dim=24)
VCFG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)


def _trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b[jax.tree_util.keystr(p)])


def test_unet_export_roundtrip():
    unet = UNetModel(UCFG)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, 4, 24)))
    sd = export_unet(params, UCFG)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = convert_unet(sd, UCFG)
    _trees_equal(params["params"], back["params"])
    # spot-check a torch-layout shape: stem conv OIHW
    assert sd["input_blocks.0.0.weight"].shape == (32, 4, 3, 3)


def test_vae_and_cond_export_roundtrip():
    vae = AutoencoderKL(VCFG)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    sd = export_vae(vp, VCFG)
    back = convert_vae(sd, VCFG)
    _trees_equal(vp["params"], back["params"])

    enc = VideoFeatEncoderPosembed(embed_dim=24, seq_len=8)
    ep = enc.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 512)))
    sd = export_cond_encoder(ep)
    assert sd["embedder.0.weight"].shape == (24, 512)
    back = convert_cond_encoder(sd)
    _trees_equal(ep["params"], back["params"])


def test_composite_ldm_export_splits_back():
    unet = UNetModel(UCFG)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 4)),
                   jnp.zeros((1,)), jnp.zeros((1, 4, 24)))
    enc = VideoFeatEncoderPosembed(embed_dim=24, seq_len=8)
    ep = enc.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 512)))
    vae = AutoencoderKL(VCFG)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))

    sd = export_ldm_state_dict({"unet": up, "cond": ep}, vp, UCFG, VCFG)
    u, v, c = split_ldm_state_dict(sd)
    _trees_equal(up["params"], convert_unet(u, UCFG)["params"])
    _trees_equal(vp["params"], convert_vae(v, VCFG)["params"])
    _trees_equal(ep["params"], convert_cond_encoder(c)["params"])


def test_cavp_export_roundtrip():
    """Stage-1 two-way door: jax CAVP variables → reference state dict →
    back through convert_cavp, bit-exact (params AND BN running stats)."""
    from diff_foley_tpu.models.cavp.cavp import CAVPModel
    from diff_foley_tpu.utils.convert import convert_cavp, export_cavp

    model = CAVPModel()
    variables = model.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 4, 32, 32, 3)),
        jnp.zeros((1, 128, 64)),
        train=False,
    )
    sd = export_cavp(variables)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    # reference layout spot checks (open_clip/model.py:457-671)
    assert sd["video_encoder.conv1.conv.weight"].shape == (64, 3, 1, 7, 7)
    assert sd["spec_encoder.conv_block1.conv1.weight"].shape == (64, 1, 3, 3)
    assert sd["video_project_head.weight"].shape == (512, 2048)
    assert sd["logit_scale"].shape == ()
    assert "spec_encoder.bn.running_mean" in sd

    back = convert_cavp(sd)
    _trees_equal(variables["params"], back["params"])
    _trees_equal(variables["batch_stats"], back["batch_stats"])


def test_cavp_export_checkpoint_envelope():
    from diff_foley_tpu.models.cavp.cavp import CAVPModel
    from diff_foley_tpu.utils.convert import export_cavp_checkpoint

    model = CAVPModel()
    variables = model.init(
        jax.random.PRNGKey(4),
        jnp.zeros((1, 4, 32, 32, 3)),
        jnp.zeros((1, 128, 64)),
        train=False,
    )
    ckpt = export_cavp_checkpoint(variables, epoch=7, name="unit")
    # envelope shape of main_wds_intra_contrast.py:393-421
    assert ckpt["epoch"] == 7 and ckpt["name"] == "unit"
    assert "state_dict" in ckpt and "logit_scale" in ckpt["state_dict"]
