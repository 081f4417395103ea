"""End-to-end determinism + API facade smoke (tiny models)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.config import load_ldm_from_yaml
from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS

TINY = LDMConfig(
    unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                    attention_resolutions=(2,), num_heads=4, context_dim=24),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=24, cond_seq_len=WINDOW_FEATS,
)


def test_generation_deterministic_under_seed():
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    pipe = DiffFoleyPipeline(ldm, params, vae_params)
    feats = np.random.default_rng(0).normal(size=(WINDOW_FEATS, 512)).astype(
        np.float32
    )
    gen = GenerationConfig(steps=3, sample_num=1, gl_iters=2,
                           classifier_scale=0.0)
    a = pipe.generate(feats, jax.random.PRNGKey(21), gen)
    b = pipe.generate(feats, jax.random.PRNGKey(21), gen)
    np.testing.assert_array_equal(a["wav"], b["wav"])
    c = pipe.generate(feats, jax.random.PRNGKey(22), gen)
    assert np.abs(c["wav"] - a["wav"]).max() > 1e-4


def test_our_yaml_configs_load():
    ldm = load_ldm_from_yaml("configs/stage2_ldm.yaml")
    assert ldm.cfg.unet.model_channels == 320
    from diff_foley_tpu.config import instantiate_from_config, load_yaml

    cfg = load_yaml("configs/double_guidance_classifier.yaml")
    clf = instantiate_from_config(cfg["model"])
    assert clf.model_channels == 128
