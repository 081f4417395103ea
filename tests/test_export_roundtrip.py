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
