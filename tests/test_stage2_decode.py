"""stage2_decode subsystem: ViViT parity vs the reference torch module and
a DecoderWrapper smoke-train (frozen CAVP features → spec reconstruction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import load_ref_module, randomize_torch_model  # noqa: E402

VIT_PATH = "/root/reference/training/stage2_ldm/adm/modules/stage2_decode/vit.py"

TINY = dict(image_size=32, image_patch_size=16, frames=4, frame_patch_size=1,
            dim=64, spatial_depth=2, temporal_depth=1, heads=4, mlp_dim=128)


@pytest.fixture(scope="module")
def ref_vit():
    return load_ref_module("ref_vivit", VIT_PATH)


def _tiny_cfg():
    from diff_foley_tpu.models.vivit import ViViTConfig

    return ViViTConfig(image_size=32, patch_size=16, frames=4, dim=64,
                       spatial_depth=2, temporal_depth=1, heads=4,
                       mlp_dim=128)


def test_vivit_parity(ref_vit):
    from diff_foley_tpu.models.vivit import ViViT
    from diff_foley_tpu.utils.convert import convert_vivit

    tm = randomize_torch_model(ref_vit.ViViT(**TINY), seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        cls_ref, feat_ref = tm(torch.from_numpy(x))

    variables = jax.tree.map(
        jnp.asarray,
        convert_vivit(tm.state_dict(), spatial_depth=2, temporal_depth=1),
    )
    cls_j, feat_j = ViViT(_tiny_cfg()).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    )
    np.testing.assert_allclose(
        np.asarray(cls_j), cls_ref.numpy(), rtol=1e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_ref.numpy(), rtol=1e-4, atol=3e-4)


def test_vivit_mean_parity(ref_vit):
    from diff_foley_tpu.models.vivit import ViViTMean
    from diff_foley_tpu.utils.convert import convert_vivit

    tm = randomize_torch_model(ref_vit.ViViT_mean(**TINY), seed=1)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, F, dim)

    variables = jax.tree.map(
        jnp.asarray,
        convert_vivit(tm.state_dict(), spatial_depth=2, temporal_depth=1,
                      temporal_cls=False),
    )
    out = ViViTMean(_tiny_cfg()).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=3e-4)


def test_decoder_wrapper_smoke_train():
    """MSE falls over a few steps reconstructing a fixed spec batch from
    frozen CAVP features (decode_wrapper.py shared_step protocol)."""
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.train.stage2_decode import (
        DecodeConfig,
        DecoderWrapper,
    )

    cfg = DecodeConfig(
        decoder=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=1,
                          out_channels=8, z_channels=512),
        lr=1e-3,
    )
    assert cfg.mel_bins == 128
    wrapper = DecoderWrapper(cfg, CAVPModel(CAVPConfig()))

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(0, 1, (2, 128, 256)), jnp.float32)
    cavp_vars = wrapper.cavp.init(
        jax.random.PRNGKey(0), spec,
        method=lambda m, s: m.encode_spec(s, normalize=True, pool=False),
    )
    state = wrapper.init_train_state(jax.random.PRNGKey(1), t_feat=16)
    step = jax.jit(wrapper.make_train_step())
    losses = []
    for i in range(5):
        state, logs = step(state, cavp_vars, spec)
        losses.append(float(logs["l2_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # decoder output covers the full mel canvas
    feats = wrapper.encode_spec(cavp_vars, spec)
    rec = wrapper.reconstruct(state.params, feats)
    assert rec.shape[:2] == (2, 128)


def test_gan_decoder_wrapper_train():
    """Decoder_Wrapper GAN mode (decode_wrapper.py:174-196): both optimizer
    branches run with finite losses and the generator improves nll."""
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.train.stage2_decode import (
        DecodeConfig,
        GANDecoderWrapper,
    )
    from diff_foley_tpu.train.vae_losses import VAELossConfig

    cfg = DecodeConfig(
        decoder=VAEConfig(ch=32, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=1,
                          out_channels=8, z_channels=512),
        lr=1e-3,
    )
    wrapper = GANDecoderWrapper(
        cfg, CAVPModel(CAVPConfig()),
        loss_cfg=VAELossConfig(disc_start=0, disc_weight=0.1),
    )
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.uniform(0, 1, (2, 128, 256)), jnp.float32)
    cavp_vars = wrapper.cavp.init(
        jax.random.PRNGKey(0), spec,
        method=lambda m, s: m.encode_spec(s, normalize=True, pool=False),
    )
    state = wrapper.init_train_state(jax.random.PRNGKey(1), t_feat=16,
                                     spec_shape=(2, 128, 256))
    step = jax.jit(wrapper.make_gan_train_step())
    nlls = []
    for _ in range(4):
        state, logs = step(state, cavp_vars, spec)
        nlls.append(float(logs["nll_loss"]))
        assert np.isfinite(float(logs["d_loss"]))
        assert np.isfinite(float(logs["decode_loss"]))
    assert nlls[-1] < nlls[0]
