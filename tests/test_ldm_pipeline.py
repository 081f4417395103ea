"""LatentDiffusion runtime + end-to-end pipeline on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig, ClassifierBackbone
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import (
    DiffFoleyPipeline,
    GenerationConfig,
    WINDOW_FEATS,
    window_features,
)

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=WINDOW_FEATS,
)


@pytest.fixture(scope="module")
def ldm_and_params():
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    return ldm, params, vae_params


def test_first_stage_roundtrip_shapes(ldm_and_params):
    ldm, params, vae_params = ldm_and_params
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 128, 512, 3))
    z = ldm.encode_first_stage(vae_params, x)
    assert z.shape == (2, 16, 64, 4)
    rec = ldm.decode_first_stage(vae_params, z)
    assert rec.shape == x.shape


def test_p_losses_finite_and_cfg_dropout(ldm_and_params):
    ldm, params, vae_params = ldm_and_params
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 64, 4))
    feat = jax.random.normal(jax.random.PRNGKey(4), (4, WINDOW_FEATS, 512))
    loss, metrics = ldm.p_losses(params, z, feat, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    assert float(loss) > 0.5  # eps-pred of zero-init out conv → ~E||ε||²=1
    assert set(metrics) >= {"loss_simple", "loss_vlb"}


def test_sample_all_samplers(ldm_and_params):
    ldm, params, vae_params = ldm_and_params
    feat = jax.random.normal(jax.random.PRNGKey(6), (2, WINDOW_FEATS, 512))
    for sampler in ("dpm", "ddim", "plms"):
        z = ldm.sample(
            params, feat, jax.random.PRNGKey(7), sampler=sampler, steps=5,
            cfg_scale=4.5,
        )
        assert z.shape == (2, 16, 64, 4)
        assert bool(jnp.isfinite(z).all()), sampler


def test_window_features():
    f = np.zeros((100, 512), np.float32)
    w = window_features(f)
    assert w.shape == (3, WINDOW_FEATS, 512)
    with pytest.raises(AssertionError):
        window_features(np.zeros((10, 512), np.float32))


def test_pipeline_end_to_end_with_double_guidance(ldm_and_params):
    ldm, params, vae_params = ldm_and_params
    # classifier context is the RAW 512-d CAVP features (reference quirk,
    # alignment_classifier.py:285-287), so context_dim must be 512
    clf_cfg = UNetConfig(
        in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        context_dim=512,
    )
    clf = ClassifierBackbone(clf_cfg)
    cp = clf.init(
        jax.random.PRNGKey(8), jnp.zeros((1, 16, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, WINDOW_FEATS, 512)),
    )

    pipe = DiffFoleyPipeline(
        ldm, params, vae_params, classifier=(clf.apply, cp)
    )
    feats = np.random.default_rng(0).normal(size=(2 * WINDOW_FEATS, 512))
    out = pipe.generate(
        feats.astype(np.float32), jax.random.PRNGKey(10),
        GenerationConfig(steps=4, sample_num=2, gl_iters=4,
                         classifier_scale=50.0),
    )
    assert out["spec"].shape == (2, 128, 1024)  # 2 samples, 2 windows concat
    assert out["wav"].shape == (2, 2 * 131072)
    assert np.isfinite(out["wav"]).all()
    assert out["spec"].min() >= 0.0 and out["spec"].max() <= 1.0


def test_bucketed_generate_matches_shape_and_determinism():
    """bucket_windows: padded fixed-size chunks reuse one compiled program;
    outputs cover exactly the real windows with finite audio."""
    import numpy as np

    from diff_foley_tpu.pipeline import (
        DiffFoleyPipeline,
        GenerationConfig,
        WINDOW_SAMPLES,
    )
    from diff_foley_tpu.diffusion.latent_diffusion import (
        LatentDiffusion,
        LDMConfig,
    )
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig

    cfg = LDMConfig(
        unet=UNetConfig(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(2,), num_heads=4, context_dim=64,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        cond_embed_dim=64,
        cond_seq_len=32,
    )
    ldm = LatentDiffusion(cfg)
    pipe = DiffFoleyPipeline(
        ldm, ldm.init_params(jax.random.PRNGKey(0)),
        ldm.init_vae_params(jax.random.PRNGKey(1)),
    )
    gen = GenerationConfig(steps=2, sample_num=1, classifier_scale=0.0,
                           gl_iters=2, return_spec=True)
    # 3 windows, bucket 2 → 2 chunks with 1 padded window trimmed
    feats = np.random.default_rng(0).normal(size=(96, 512)).astype(np.float32)
    out = pipe.generate(feats, jax.random.PRNGKey(2), gen, bucket_windows=2)
    assert out["wav"].shape == (1, 3 * WINDOW_SAMPLES)
    assert out["spec"].shape == (1, 128, 3 * 512)
    assert np.isfinite(out["wav"]).all()
