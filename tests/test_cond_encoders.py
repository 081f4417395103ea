"""Experimental cond-stage encoder variants: parity vs the reference torch
modules (adm/modules/cond_stage/video_feat_encoder.py) with converted random
weights — MLP / simple / autoregressive Posembed_AR (cross-attention fusion
with the previous window's spec latent)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import randomize_torch_model  # noqa: E402

sys.path.insert(0, "/root/reference/training/stage2_ldm")

from diff_foley_tpu.models.cond_encoder import (  # noqa: E402
    VideoFeatEncoderMLP,
    VideoFeatEncoderPosembedAR,
    VideoFeatEncoderSimple,
)
from diff_foley_tpu.utils.convert import (  # noqa: E402
    convert_cond_encoder_ar,
    convert_cond_encoder_mlp,
    convert_cond_encoder_simple,
)


@pytest.fixture(scope="module")
def ref_mod():
    return pytest.importorskip(
        "adm.modules.cond_stage.video_feat_encoder"
    )


def test_mlp_encoder_parity(ref_mod):
    tm = randomize_torch_model(
        ref_mod.Video_Feat_Encoder(origin_dim=32, embed_dim=48), seed=0
    )
    x = np.random.default_rng(0).normal(size=(2, 10, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    params = jax.tree.map(jnp.asarray, convert_cond_encoder_mlp(tm.state_dict()))
    out = VideoFeatEncoderMLP(embed_dim=48).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_simple_encoder_parity(ref_mod):
    tm = randomize_torch_model(
        ref_mod.Video_Feat_Encoder_simple(origin_dim=32, embed_dim=48), seed=1
    )
    x = np.random.default_rng(1).normal(size=(2, 10, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    params = jax.tree.map(
        jnp.asarray, convert_cond_encoder_simple(tm.state_dict())
    )
    out = VideoFeatEncoderSimple(embed_dim=48).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_ar_encoder_parity(ref_mod):
    # reference constraint: hidden_dim must equal heads*d_head (=512) for
    # SpatialTransformer_Cond's LayerNorm(inner)/self-attn to run; use the
    # same geometry scaled down via d_head
    hidden, depth = 64, 2
    tm = ref_mod.Video_Feat_Encoder_Posembed_AR(
        origin_dim=32, hidden_dim=hidden, embed_dim=48, depth=depth, seq_len=20
    )
    # shrink the fusion transformer to d_head=8 so inner==hidden
    tm.fusion_net = ref_mod.FusionNet(hidden, 48, depth, heads=8, d_head=8)
    randomize_torch_model(tm, seed=2)

    rng = np.random.default_rng(2)
    video = rng.normal(size=(2, 12, 32)).astype(np.float32)
    spec_z = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)  # torch NCHW
    with torch.no_grad():
        ref = tm(
            {
                "video_feat": torch.from_numpy(video),
                "spec_prev_z": torch.from_numpy(spec_z),
            }
        ).numpy()

    params = jax.tree.map(
        jnp.asarray, convert_cond_encoder_ar(tm.state_dict(), depth=depth)
    )
    model = VideoFeatEncoderPosembedAR(
        hidden_dim=hidden, embed_dim=48, depth=depth, seq_len=20,
        heads=8, dim_head=8,
    )
    out = model.apply(
        params,
        {
            "video_feat": jnp.asarray(video),
            "spec_prev_z": jnp.asarray(spec_z.transpose(0, 2, 3, 1)),
        },
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
