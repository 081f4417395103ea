"""Data-parallel pipeline serving: DiffFoleyPipeline(mesh=...) matches the
single-device pipeline exactly (params replicated, windows P('data'))."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh
from diff_foley_tpu.pipeline import (
    DiffFoleyPipeline,
    GenerationConfig,
    WINDOW_SAMPLES,
)

TINY = LDMConfig(
    unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                    attention_resolutions=(2,), num_heads=4, context_dim=64),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=64, cond_seq_len=32,
)


def test_mesh_pipeline_matches_single(eight_devices):
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    gen = GenerationConfig(steps=2, sample_num=1, classifier_scale=0.0,
                           gl_iters=2, return_spec=True)
    # 3 windows: ragged over 8 devices → padded to 8, trimmed back
    feats = np.random.default_rng(0).normal(size=(96, 512)).astype(np.float32)

    plain = DiffFoleyPipeline(ldm, params, vae_params)
    ref = plain.generate(feats, jax.random.PRNGKey(2), gen)

    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    sharded = DiffFoleyPipeline(ldm, params, vae_params, mesh=mesh)
    with mesh:
        out = sharded.generate(feats, jax.random.PRNGKey(2), gen)

    assert out["wav"].shape == (1, 3 * WINDOW_SAMPLES)
    np.testing.assert_allclose(out["wav"], ref["wav"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["spec"], ref["spec"], rtol=1e-4, atol=2e-4)
