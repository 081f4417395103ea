"""Numerical parity vs the reference PyTorch modules (random weights).

Builds small-config reference torch models from /root/reference, converts
their state dicts with utils.convert, and checks forward outputs agree.
This validates both the architecture transcription and the checkpoint
converter (SURVEY.md §7 hard part #2).
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- make the reference package importable without pytorch_lightning -------
if "pytorch_lightning" not in sys.modules:
    fake_pl = types.ModuleType("pytorch_lightning")
    fake_pl.LightningModule = torch.nn.Module
    sys.modules["pytorch_lightning"] = fake_pl
if "omegaconf" not in sys.modules:
    fake_oc = types.ModuleType("omegaconf")
    fake_lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    fake_lc.ListConfig = ListConfig
    fake_oc.listconfig = fake_lc
    sys.modules["omegaconf"] = fake_oc
    sys.modules["omegaconf.listconfig"] = fake_lc
sys.path.insert(0, "/root/reference")

from diff_foley_tpu.models.cond_encoder import VideoFeatEncoderPosembed
from diff_foley_tpu.models.unet import ClassifierBackbone, UNetConfig, UNetModel
from diff_foley_tpu.models.vae import AutoencoderKL as JaxVAE
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.utils.convert import (
    convert_classifier_backbone,
    convert_cond_encoder,
    convert_unet,
    convert_vae,
)

RTOL, ATOL = 1e-4, 2e-4


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_unet_parity(rng):
    from diff_foley.modules.diffusionmodules.openai_unetmodel import (
        UNetModel as TorchUNet,
    )

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4), num_heads=4,
        context_dim=24,
    )
    tm = TorchUNet(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[4, 2, 1], num_res_blocks=2, channel_mult=[1, 2, 4],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24, use_checkpoint=False, legacy=False,
    ).eval()
    # randomise: the reference zero-inits the final out conv (zero_module),
    # which would make the comparison trivially 0 == 0
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p_ in tm.parameters():
            p_.uniform_(-0.05, 0.05, generator=g)

    x = rng.normal(size=(2, 16, 32, 4)).astype(np.float32)
    t = np.array([7.0, 345.0], dtype=np.float32)
    c = rng.normal(size=(2, 10, 24)).astype(np.float32)

    with torch.no_grad():
        ref = _to_nhwc(tm(_nchw(x), torch.from_numpy(t), torch.from_numpy(c)))

    params = jax.tree.map(jnp.asarray, convert_unet(tm.state_dict(), cfg))
    out = UNetModel(cfg).apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_classifier_backbone_parity(rng):
    from diff_foley.modules.double_guidance.alignment_backbone import (
        Classifier_Backbone,
    )

    cfg = UNetConfig(
        in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 4), channel_mult=(1, 2, 2), num_heads=4,
        context_dim=24,
    )
    tm = Classifier_Backbone(
        image_size=32, in_channels=4, out_channels=1, model_channels=32,
        attention_resolutions=[2, 4], num_res_blocks=1, channel_mult=[1, 2, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24, use_checkpoint=False, legacy=False,
    ).eval()

    x = rng.normal(size=(3, 16, 64, 4)).astype(np.float32)
    t = np.array([0.0, 10.0, 900.0], dtype=np.float32)
    c = rng.normal(size=(3, 32, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x), torch.from_numpy(t), torch.from_numpy(c)).numpy()

    params = jax.tree.map(
        jnp.asarray, convert_classifier_backbone(tm.state_dict(), cfg)
    )
    out = ClassifierBackbone(cfg).apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)
    assert out.shape == (3, 1)


def test_vae_parity(rng):
    from diff_foley.models.autoencoder import AutoencoderKL as TorchVAE

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                    embed_dim=4)
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
    )
    tm = TorchVAE(
        ddconfig=ddconfig, lossconfig={"target": "torch.nn.Identity"}, embed_dim=4
    ).eval()

    x = rng.normal(size=(2, 32, 64, 3)).astype(np.float32)
    with torch.no_grad():
        post = tm.encode(_nchw(x))
        z_ref = post.mode().numpy().transpose(0, 2, 3, 1)
        rec_ref = _to_nhwc(tm.decode(post.mode()))

    params = jax.tree.map(jnp.asarray, convert_vae(tm.state_dict(), cfg))
    model = JaxVAE(cfg)
    z = model.apply(params, jnp.asarray(x), method=lambda m, a: m.encode(a).mode())
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=RTOL, atol=ATOL)
    rec = model.apply(params, z, method=lambda m, a: m.decode(a))
    np.testing.assert_allclose(np.asarray(rec), rec_ref, rtol=RTOL, atol=5e-4)


def test_cond_encoder_parity(rng):
    from diff_foley.modules.cond_stage.video_feat_encoder import (
        Video_Feat_Encoder_Posembed,
    )

    tm = Video_Feat_Encoder_Posembed(origin_dim=512, embed_dim=768, seq_len=40).eval()
    x = rng.normal(size=(2, 32, 512)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params = jax.tree.map(jnp.asarray, convert_cond_encoder(tm.state_dict()))
    out = VideoFeatEncoderPosembed(embed_dim=768, seq_len=40).apply(
        params, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)
