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

    # a fresh pipeline object warms the same bucket and restores from disk:
    # the cache key carries the device topology, so any process with the
    # SAME topology (incl. this 8-device CPU host) reuses the executable
    pipe2 = _tiny_pipe()
    report2 = pipe2.aot_warmup([2], gen, cache_dir=str(tmp_path))
    assert report2[2][0] == "loaded"
    out2 = pipe2.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(np.asarray(out_jit["wav"]),
                               np.asarray(out2["wav"]), rtol=1e-5, atol=1e-5)

    # a different gen config must NOT hit the same executable
    gen2 = dataclasses.replace(gen, cfg_scale=1.0)
    assert (2, gen2) not in pipe2._aot


def _tiny_pipe_with_classifier(clf_seed=8, mesh=None):
    from diff_foley_tpu.models.unet import ClassifierBackbone

    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(2,),
                        num_heads=4, context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        cond_embed_dim=24,
    ))
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    clf_cfg = UNetConfig(
        in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        context_dim=512,
    )
    clf = ClassifierBackbone(clf_cfg)
    cp = clf.init(
        jax.random.PRNGKey(clf_seed), jnp.zeros((1, 16, 64, 4)),
        jnp.zeros((1,)), jnp.zeros((1, WINDOW_FEATS, 512)),
    )
    # a fresh backbone's zero-initialized output conv gives exactly-zero
    # guidance gradients; perturb all params (seed-dependently) so the
    # classifier actually steers the sampler
    leaves, treedef = jax.tree.flatten(cp)
    ks = jax.random.split(jax.random.PRNGKey(clf_seed + 1), len(leaves))
    cp = jax.tree.unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, ks)
    ])
    return DiffFoleyPipeline(ldm, params, vae_params,
                             classifier=(clf.apply, cp), mesh=mesh)


def test_aot_classifier_weights_are_runtime_args(tmp_path):
    """A restored executable must guide with the CURRENT classifier weights:
    retraining the classifier and restarting may hit the same cache entry
    (same structure), and stale baked-in weights would silently serve old
    guidance."""
    gen = GenerationConfig(steps=2, sample_num=1, gl_iters=2,
                           classifier_scale=50.0)
    feats = np.random.default_rng(0).normal(
        size=(WINDOW_FEATS, 512)).astype(np.float32)

    pipe = _tiny_pipe_with_classifier(clf_seed=8)
    report = pipe.aot_warmup([1], gen, cache_dir=str(tmp_path))
    assert report[1][0] == "compiled"
    out_a = pipe.generate(feats, jax.random.PRNGKey(3), gen)

    # "retrained" classifier (different weights, same structure) → the same
    # cache entry restores, but guidance must follow the new weights
    pipe2 = _tiny_pipe_with_classifier(clf_seed=99)
    report2 = pipe2.aot_warmup([1], gen, cache_dir=str(tmp_path))
    assert report2[1][0] == "loaded"
    out_b = pipe2.generate(feats, jax.random.PRNGKey(3), gen)
    assert np.abs(out_a["spec"] - out_b["spec"]).max() > 1e-6

    # same weights through the restored executable ≡ the jit path
    pipe3 = _tiny_pipe_with_classifier(clf_seed=99)
    out_jit = pipe3.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(np.asarray(out_jit["spec"]),
                               np.asarray(out_b["spec"]),
                               rtol=1e-5, atol=1e-5)


def test_aot_warmup_under_mesh(tmp_path, eight_devices):
    """Meshed pipelines lower the AOT program with the dispatch-time
    P('data') input sharding, so the cached executable accepts generate()'s
    sharded inputs; a same-topology process restores from disk."""
    from diff_foley_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, devices=eight_devices[:4])
    gen = GenerationConfig(steps=2, sample_num=1, gl_iters=2)
    feats = np.random.default_rng(0).normal(
        size=(4 * WINDOW_FEATS, 512)).astype(np.float32)

    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(2,),
                        num_heads=4, context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        cond_embed_dim=24,
    ))
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    pipe = DiffFoleyPipeline(ldm, params, vae_params, mesh=mesh)
    out_jit = pipe.generate(feats, jax.random.PRNGKey(3), gen)
    report = pipe.aot_warmup([4], gen, cache_dir=str(tmp_path))
    assert report[4][0] == "compiled"
    out_aot = pipe.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(np.asarray(out_jit["wav"]),
                               np.asarray(out_aot["wav"]),
                               rtol=1e-5, atol=1e-5)

    pipe2 = DiffFoleyPipeline(ldm, params, vae_params, mesh=mesh)
    report2 = pipe2.aot_warmup([4], gen, cache_dir=str(tmp_path))
    assert report2[4][0] == "loaded", report2
    out2 = pipe2.generate(feats, jax.random.PRNGKey(3), gen)
    np.testing.assert_allclose(np.asarray(out_jit["wav"]),
                               np.asarray(out2["wav"]), rtol=1e-5, atol=1e-5)


def test_aot_load_failures_fall_back(tmp_path):
    from diff_foley_tpu.utils.aot import load_executable

    missing = str(tmp_path / "nope.aot")
    assert load_executable(missing) is None
    corrupt = tmp_path / "bad.aot"
    corrupt.write_bytes(b"not a pickle")
    assert load_executable(str(corrupt)) is None
