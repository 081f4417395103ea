"""wav_dtype="int16": on-device PCM quantization for the bulk readback.

The fused program converts waveforms with write_wav's exact quantization
(clip(-1,1)·32767 → C-cast truncation) before the host transfer, halving
the relay bytes; the resulting WAV files must be byte-identical to the
float32 path's.
"""
import os

import jax
import numpy as np
import pytest

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import (
    DiffFoleyPipeline,
    GenerationConfig,
    WINDOW_FEATS,
    _pack_wav,
)
from diff_foley_tpu.utils.wav import read_wav, write_wav

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=WINDOW_FEATS,
)


def test_pack_wav_matches_write_wav_quantization():
    rng = np.random.default_rng(0)
    # include out-of-range values, exact ±1, and tiny magnitudes
    w = np.concatenate([
        rng.uniform(-1.4, 1.4, size=4096).astype(np.float32),
        np.array([-1.0, 1.0, 0.0, 1e-6, -1e-6, 0.99997], np.float32),
    ])
    packed = np.asarray(_pack_wav(jax.numpy.asarray(w), "int16"))
    assert packed.dtype == np.int16
    ref = (np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(packed, ref)
    # float32 is a passthrough
    assert _pack_wav(jax.numpy.asarray(w), "float32").dtype == np.float32


def test_serving_engine_defaults_to_int16():
    import inspect

    from diff_foley_tpu.serving import BatchingEngine

    default = inspect.signature(BatchingEngine.__init__).parameters["gen"].default
    assert default.wav_dtype == "int16" and not default.return_spec


def test_pipeline_int16_wav_matches_float_path(tmp_path):
    ldm = LatentDiffusion(TINY)
    pipe = DiffFoleyPipeline(
        ldm,
        ldm.init_params(jax.random.PRNGKey(0)),
        ldm.init_vae_params(jax.random.PRNGKey(1)),
    )
    feats = np.random.default_rng(1).normal(
        size=(WINDOW_FEATS, 512)).astype(np.float32)
    kw = dict(sampler="ddim", steps=2, sample_num=1, gl_iters=2,
              cfg_scale=1.0, classifier_scale=0.0, return_spec=False)
    out_f = pipe.generate(feats, jax.random.PRNGKey(2),
                          GenerationConfig(**kw))
    out_i = pipe.generate(feats, jax.random.PRNGKey(2),
                          GenerationConfig(wav_dtype="int16", **kw))
    assert out_i["wav"].dtype == np.int16
    assert out_f["wav"].dtype == np.float32

    p_f, p_i = str(tmp_path / "f.wav"), str(tmp_path / "i.wav")
    write_wav(p_f, out_f["wav"][0])
    write_wav(p_i, out_i["wav"][0])
    with open(p_f, "rb") as a, open(p_i, "rb") as b:
        assert a.read() == b.read(), "wav files must be byte-identical"
    pcm, sr = read_wav(p_i)
    assert sr == 16000 and np.isfinite(pcm).all()
    assert os.path.getsize(p_i) > 44  # non-empty payload past the header
