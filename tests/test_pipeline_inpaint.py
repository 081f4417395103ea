"""Pipeline-level inpainting/continuation (DiffFoleyPipeline.inpaint).

The per-step mask/x0 blend itself is parity-tested against the reference
torch loops in test_ancestral_inpaint_parity.py; these tests pin the
spec-level plumbing around it: mask min-pooling to latent resolution, VAE
canvas encode, sample_num repetition, and that a fully-known canvas is
actually reproduced (≈ VAE roundtrip) while free generation is not.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import (
    DiffFoleyPipeline,
    GenerationConfig,
    SPEC_HW,
    WINDOW_FEATS,
    continuation_mask,
    spec_mask_to_latent,
)

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=WINDOW_FEATS,
)


@pytest.fixture(scope="module")
def pipe():
    ldm = LatentDiffusion(TINY)
    return DiffFoleyPipeline(
        ldm,
        ldm.init_params(jax.random.PRNGKey(0)),
        ldm.init_vae_params(jax.random.PRNGKey(1)),
    )


def test_spec_mask_to_latent_minpool():
    # one window; know frames [0, 100) of 512 → latent columns fully inside
    # frames <100 are 1, the column straddling the boundary (96..104) is 0
    m = continuation_mask(512, 100)[None]  # (1, 128, 512)
    lat = spec_mask_to_latent(m)
    assert lat.shape == (1, 16, 64, 1)
    col = lat[0, :, :, 0]
    assert (col[:, :12] == 1.0).all()   # 12*8 = 96 ≤ 100: fully known
    assert (col[:, 12:] == 0.0).all()   # col 12 spans 96..104 > 100: regen
    # a partially-known 8×8 patch must NOT count as known (min, not mean)
    part = np.ones((1, 128, 512), np.float32)
    part[0, 3, 17] = 0.0
    lat2 = spec_mask_to_latent(part)
    assert lat2[0, 0, 2, 0] == 0.0 and lat2.sum() == 16 * 64 - 1


def test_inpaint_shapes_and_known_region(pipe):
    """Fully-known canvas ⇒ output ≈ VAE roundtrip of the canvas; free
    generation is far from it — the mask path demonstrably constrains."""
    w = 2
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(w * WINDOW_FEATS, 512)).astype(np.float32)
    known = rng.uniform(0.2, 0.8, size=(128, w * 512)).astype(np.float32)
    # cfg_scale=1: with random weights, CFG would amplify the (meaningless)
    # eps by 4.5× in the final blended step, blurring the reproduction this
    # test exists to demonstrate. The blend itself is CFG-parity-tested in
    # test_ancestral_inpaint_parity.py.
    gen = GenerationConfig(sampler="ddim", steps=4, sample_num=2, gl_iters=2,
                           cfg_scale=1.0, classifier_scale=0.0)

    out = pipe.inpaint(
        feats, known, np.ones_like(known), jax.random.PRNGKey(3), gen)
    assert out["spec"].shape == (2, 128, w * 512)
    assert out["wav"].shape == (2, w * 131072)
    assert np.isfinite(out["wav"]).all()
    assert out["spec"].min() >= 0.0 and out["spec"].max() <= 1.0

    # the reproduction target: decode(encode(known)) per window, channel 0
    ldm = pipe.ldm
    x = jnp.repeat(jnp.asarray(
        known.reshape(128, w, 512).transpose(1, 0, 2))[..., None], 3, -1)
    z0 = ldm.encode_first_stage(pipe.vae_params, x)
    rt = np.clip(np.asarray(
        ldm.decode_first_stage(pipe.vae_params, z0)[..., 0]), 0, 1)
    rt = rt.transpose(1, 0, 2).reshape(128, w * 512)

    free = pipe.generate(feats, jax.random.PRNGKey(3), gen)
    err_inpaint = np.abs(out["spec"] - rt[None]).mean()
    err_free = np.abs(free["spec"] - rt[None]).mean()
    # The final known-region composite in _inpaint_fused makes a fully-known
    # canvas an exact VAE roundtrip — err_inpaint is pure decode(encode(·))
    # re-quantisation noise, far below free generation. Per-step blend
    # parity lives in test_ancestral_inpaint_parity.py.
    assert err_inpaint < 0.1 * err_free, (err_inpaint, err_free)

    # partial mask: both regions finite, spec still bounded
    half = continuation_mask(w * 512, 512)
    out2 = pipe.inpaint(feats, known, half, jax.random.PRNGKey(4), gen)
    assert np.isfinite(out2["spec"]).all()


def test_inpaint_rejects_bad_inputs(pipe):
    feats = np.zeros((WINDOW_FEATS, 512), np.float32)
    known = np.zeros((128, 512), np.float32)
    with pytest.raises(ValueError, match="sampler"):
        pipe.inpaint(feats, known, np.ones_like(known),
                     jax.random.PRNGKey(0), GenerationConfig(sampler="dpm"))
    with pytest.raises(ValueError, match="shape mismatch"):
        pipe.inpaint(feats, known, np.ones((128, 256), np.float32),
                     jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="known_spec must be"):
        short = np.zeros((128, 256), np.float32)
        pipe.inpaint(feats, short, np.ones_like(short), jax.random.PRNGKey(0))
    assert SPEC_HW == (128, 512)
