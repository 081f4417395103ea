"""AOT executable cache (utils/aot.py + DiffFoleyPipeline.aot_warmup).

The serving warm-restart path: serialized executables restore without jax
tracing (measured on the flagship: 457.8 s trace+lower vs seconds to
restore). Here: a tiny pipeline proves save → restore → identical outputs,
and the corrupt/missing-entry fallbacks stay silent.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS


def _tiny_pipe():
    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(2,),
                        num_heads=4, context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        cond_embed_dim=24,
    ))
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    return DiffFoleyPipeline(ldm, params, vae_params)


def test_aot_warmup_restores_and_matches_jit(tmp_path):
    pipe = _tiny_pipe()
    gen = GenerationConfig(steps=2, sample_num=1, gl_iters=2,
                           return_spec=True)
    feats = np.random.default_rng(0).normal(
        size=(2 * WINDOW_FEATS, 512)).astype(np.float32)

    # jit path first (no AOT entries yet)
    out_jit = pipe.generate(feats, jax.random.PRNGKey(3), gen)

    report = pipe.aot_warmup([2], gen, cache_dir=str(tmp_path))
    assert report[2][0] == "compiled"
    out_aot = pipe.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(out_jit["wav"], out_aot["wav"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_jit["spec"], out_aot["spec"],
                               rtol=1e-5, atol=1e-5)

    # a fresh pipeline object warms the same bucket; on a single-device
    # process this restores from disk ("loaded") — on the 8-device CPU test
    # host, deserialize_and_load rebinds to all devices so aot_warmup
    # deliberately recompiles (cross-process reuse is serving-topology-only)
    pipe2 = _tiny_pipe()
    expected = "loaded" if len(jax.devices()) == 1 else "compiled"
    report2 = pipe2.aot_warmup([2], gen, cache_dir=str(tmp_path))
    assert report2[2][0] == expected
    out2 = pipe2.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(np.asarray(out_jit["wav"]),
                               np.asarray(out2["wav"]), rtol=1e-5, atol=1e-5)

    # a different gen config must NOT hit the same executable
    gen2 = dataclasses.replace(gen, cfg_scale=1.0)
    assert (2, gen2) not in pipe2._aot


def test_aot_load_failures_fall_back(tmp_path):
    from diff_foley_tpu.utils.aot import load_executable

    missing = str(tmp_path / "nope.aot")
    assert load_executable(missing) is None
    corrupt = tmp_path / "bad.aot"
    corrupt.write_bytes(b"not a pickle")
    assert load_executable(str(corrupt)) is None
