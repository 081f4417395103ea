"""bf16 first-stage decode (`DiffFoleyPipeline(vae_dtype="bfloat16")`):
the serving fast path stays within bf16 tolerance of the fp32 decode.
Conv kernels/activations run bf16; GroupNorm stats stay fp32 (the
GroupNorm32 policy, models/layers.py) — see PARITY_FLAGSHIP.json for the
flagship drift record on real hardware."""
import dataclasses

import jax
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig

TINY = LDMConfig(
    unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                    attention_resolutions=(2,), num_heads=4, context_dim=64),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=64, cond_seq_len=32,
)


def test_bf16_vae_decode_matches_fp32():
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    gen = GenerationConfig(steps=2, sample_num=1, classifier_scale=0.0,
                           gl_iters=2, return_spec=True)
    feats = np.random.default_rng(0).normal(size=(64, 512)).astype(np.float32)

    ref = DiffFoleyPipeline(ldm, params, vae_params).generate(
        feats, jax.random.PRNGKey(2), gen)
    out = DiffFoleyPipeline(ldm, params, vae_params,
                            vae_dtype="bfloat16").generate(
        feats, jax.random.PRNGKey(2), gen)

    assert out["spec"].dtype == ref["spec"].dtype  # fp32 surface either way
    assert np.isfinite(out["wav"]).all()
    # spec lives in [0,1]; bf16 conv stack drift is a few ulps of bf16
    d = np.abs(out["spec"] - ref["spec"]).max()
    assert d < 0.05, f"bf16 decode drifted {d} on a [0,1] spec"


def test_generation_config_solver_opts():
    """GenerationConfig.solver_opts reaches the DPM library through the
    jitted pipeline (static, hashable (k, v) pairs)."""
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    pipe = DiffFoleyPipeline(ldm, params, vae_params)
    feats = np.random.default_rng(0).normal(size=(64, 512)).astype(np.float32)
    base = GenerationConfig(steps=4, sample_num=1, classifier_scale=0.0,
                            gl_iters=2, return_spec=True)
    o2 = pipe.generate(feats, jax.random.PRNGKey(2), base)
    gen3 = dataclasses.replace(
        base, solver_opts=(("order", 3), ("method", "singlestep")))
    o3 = pipe.generate(feats, jax.random.PRNGKey(2), gen3)
    assert np.isfinite(o3["wav"]).all()
    # a different solver configuration must actually change the trajectory
    assert np.abs(o3["spec"] - o2["spec"]).max() > 1e-6

    # solver options reach only samplers that honour them: plms must fail
    # loudly instead of silently dropping e.g. order=3
    import pytest

    genp = dataclasses.replace(base, sampler="plms",
                               solver_opts=(("order", 3),))
    with pytest.raises(TypeError, match="plms accepts no solver options"):
        pipe.generate(feats, jax.random.PRNGKey(2), genp)
