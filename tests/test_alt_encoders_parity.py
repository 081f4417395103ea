"""Alternate CAVP encoder parity vs the actual reference torch towers.

Covers the factory-selectable encoders (model.py:490-620): X3D, I3D,
R(2+1)D-34 video towers and the spec ResNet-50 / Spec-ViT audio towers, each
converted from a random-weight torch state dict and compared side by side.
"""
import sys
import types

import importlib
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import (  # noqa: E402
    install_fvcore_stub,
    install_mmcv_stub,
    randomize_torch_model,
)

OPEN_CLIP_DIR = "/root/reference/training/open_cavp_main/src/open_clip"


@pytest.fixture(scope="module")
def refoc():
    """The reference open_clip sources as an importable package."""
    install_mmcv_stub()
    install_fvcore_stub()
    if "refoc" not in sys.modules:
        pkg = types.ModuleType("refoc")
        pkg.__path__ = [OPEN_CLIP_DIR]
        sys.modules["refoc"] = pkg
    return sys.modules["refoc"]


def _to_jax(tree):
    return jax.tree.map(jnp.asarray, tree)


# --------------------------------------------------------------------------
# video towers
# --------------------------------------------------------------------------

def test_x3d_parity(refoc):
    from diff_foley_tpu.models.cavp.x3d import X3D, X3DConfig
    from diff_foley_tpu.utils.convert import convert_x3d

    mod = importlib.import_module("refoc.x3d")
    cfg = mod.load_config(None)
    cfg.X3D.WIDTH_FACTOR = 1.0
    cfg.X3D.DEPTH_FACTOR = 1.0
    cfg.X3D.DIM_C5 = 64
    cfg.MODEL.OUT_DIM = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    tm = randomize_torch_model(mod.X3D(cfg), seed=0)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm([torch.from_numpy(x)]).numpy()  # (B, 16, 32)

    jcfg = X3DConfig(width_factor=1.0, depth_factor=1.0, dim_c5=64, out_dim=32)
    variables = _to_jax(convert_x3d(tm.state_dict(), depth_factor=1.0))
    out = X3D(jcfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_i3d_parity(refoc):
    from diff_foley_tpu.models.cavp.x3d import I3DConfig, I3DResNet
    from diff_foley_tpu.utils.convert import convert_i3d

    mod = importlib.import_module("refoc.x3d")
    cfg = mod.load_config(None)
    cfg.MODEL.ARCH = "i3d"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.OUT_DIM = 32
    cfg.RESNET.TRANS_FUNC = "bottleneck_transform"
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    tm = randomize_torch_model(mod.ResNet(cfg), seed=1)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm([torch.from_numpy(x)]).numpy()  # (B, 16, 32)

    variables = _to_jax(convert_i3d(tm.state_dict()))
    out = I3DResNet(I3DConfig(out_dim=32)).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_r2plus1d_parity(refoc):
    from diff_foley_tpu.models.cavp.r2plus1d import (
        R2Plus1dConfig,
        ResNet2Plus1d,
    )
    from diff_foley_tpu.utils.convert import convert_r2plus1d

    mod = importlib.import_module("refoc.resnet2plus1d")
    tm = randomize_torch_model(mod.init_R2plus(), seed=2)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, 16, 512)

    variables = _to_jax(convert_r2plus1d(tm.state_dict()))
    out = ResNet2Plus1d(R2Plus1dConfig()).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------------
# audio towers
# --------------------------------------------------------------------------

def test_spec_resnet50_parity(refoc):
    from diff_foley_tpu.models.cavp.spec_towers import SpecResNet50
    from diff_foley_tpu.utils.convert import convert_spec_resnet50

    ac = importlib.import_module("refoc.audio_contrastive")
    tm = randomize_torch_model(ac.spec_encoder_resnet50(truncate_sec=4), seed=3)

    rng = np.random.default_rng(3)
    spec = rng.normal(size=(2, 1, 128, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(spec))  # (B, 2048, 16)
        ref = ref.permute(0, 2, 1).numpy()  # (B, 16, 2048)

    variables = _to_jax(convert_spec_resnet50(tm.state_dict()))
    out = SpecResNet50().apply(
        variables, jnp.asarray(spec.transpose(0, 2, 3, 1)), train=False
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_spec_vit_parity(refoc):
    from diff_foley_tpu.models.cavp.spec_towers import SpecViT, SpecViTConfig
    from diff_foley_tpu.utils.convert import convert_spec_vit

    ac = importlib.import_module("refoc.audio_contrastive")
    tm = ac.Spec_VIT(
        spec_size=64, patch_size=16, width=64, layers=2, heads=4,
        mlp_ratio=4, output_dim=32,
    )
    randomize_torch_model(tm, seed=4)

    rng = np.random.default_rng(4)
    spec = rng.normal(size=(2, 128, 64)).astype(np.float32)
    with torch.no_grad():
        pooled_ref, tokens_ref = tm(torch.from_numpy(spec))

    cfg = SpecViTConfig(spec_size=64, patch_size=16, width=64, layers=2,
                        heads=4, output_dim=32)
    variables = _to_jax(convert_spec_vit(tm.state_dict(), layers=2))
    pooled, tokens = SpecViT(cfg).apply(variables, jnp.asarray(spec))
    np.testing.assert_allclose(
        np.asarray(pooled), pooled_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tokens), tokens_ref.numpy(), rtol=1e-4, atol=1e-4
    )


def test_spec_vit_mean_parity(refoc):
    from diff_foley_tpu.models.cavp.spec_towers import (
        SpecViTConfig,
        SpecViTMean,
    )
    from diff_foley_tpu.utils.convert import convert_spec_vit

    ac = importlib.import_module("refoc.audio_contrastive")
    tm = ac.Spec_VIT_mean(
        spec_size=64, patch_size=16, width=64, layers=2, heads=4,
        mlp_ratio=4, output_dim=32,
    )
    randomize_torch_model(tm, seed=5)

    rng = np.random.default_rng(5)
    spec = rng.normal(size=(2, 128, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(spec)).numpy()  # (B, 4, 32)

    cfg = SpecViTConfig(spec_size=64, patch_size=16, width=64, layers=2,
                        heads=4, output_dim=32, cls_token=False)
    variables = _to_jax(
        convert_spec_vit(tm.state_dict(), layers=2, cls_token=False)
    )
    out = SpecViTMean(cfg).apply(variables, jnp.asarray(spec))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# factory dispatch end-to-end
# --------------------------------------------------------------------------

def test_cavp_factory_alt_archs():
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel

    m = CAVPModel(CAVPConfig(video_arch="x3d", spec_arch="spec_vit"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(1, 16, 32, 32, 3)), jnp.float32)
    spec = jnp.asarray(rng.normal(size=(1, 128, 256)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), video, spec)
    out = m.apply(variables, video, spec)
    assert out["video_features"].shape == (1, 512)
    assert out["spec_features"].shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["video_features"]), axis=-1), 1.0,
        rtol=1e-5,
    )


def test_cnn10_parity(refoc):
    from diff_foley_tpu.models.cavp.cnn14 import Cnn10
    from diff_foley_tpu.utils.convert import convert_cnn10

    from ref_stubs import randomize_torch_model

    mod = importlib.import_module("refoc.cnn10")
    tm = randomize_torch_model(mod.Cnn10(embed_dim=32), seed=6)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 1, 64, 128)).astype(np.float32)  # (B,1,T,Mel)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, T/16, 32)

    variables = jax.tree.map(jnp.asarray, convert_cnn10(tm.state_dict()))
    out = Cnn10(embed_dim=32).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_cavp_cnn10_factory():
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel

    m = CAVPModel(CAVPConfig(spec_arch="cnn10"))
    spec = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 128, 256)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), spec,
               method=lambda mm, s: mm.encode_spec(s, pool=True))
    out = m.apply(v, spec, method=lambda mm, s: mm.encode_spec(
        s, pool=True, normalize=True))
    assert out.shape == (1, 512)


def test_cavp_vivit_tower():
    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.models.vivit import ViViTConfig, ViViTMean

    m = CAVPModel(CAVPConfig(video_arch="vivit"))
    # patch 32 → 224 input; use the real config's frame count
    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 224, 224, 3)) * 0.1,
        jnp.float32)
    v = m.init(jax.random.PRNGKey(0), video,
               method=lambda mm, a: mm.encode_video(a, pool=False))
    toks = m.apply(v, video,
                   method=lambda mm, a: mm.encode_video(a, pool=False))
    pooled = m.apply(v, video, method=lambda mm, a: mm.encode_video(
        a, pool=True, normalize=True))
    assert toks.shape == (1, 16, 512)
    assert pooled.shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pooled)), 1.0, rtol=1e-5)
