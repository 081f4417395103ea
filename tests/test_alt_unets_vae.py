"""Alt UNets / 1D audio VAE / text embedders / ST-1D / mux guard
(reference's experimental 1D-audio stack: audio_unetmodel.py,
openai_unetmodel_pos.py, stage1_model/model.py + Sound_AutoencoderKL,
cond_stage/clip_embedder.py, attention.py:218-297)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import load_ref_module, randomize_torch_model  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")  # namespace pkg: diff_foley.*


# --------------------------------------------------------------------------
# SpatialTransformer1D
# --------------------------------------------------------------------------

def test_spatial_transformer_1d_parity():
    from diff_foley.modules.diffusionmodules import attention as ref_attn

    from diff_foley_tpu.models.attention import SpatialTransformer1D
    from diff_foley_tpu.utils.convert import convert_spatial_transformer1d

    tm = ref_attn.SpatialTransformer(
        in_channels=64, n_heads=4, d_head=16, depth=1, context_dim=24,
        use_zero_module=False,
    )
    randomize_torch_model(tm, seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 10)).astype(np.float32)      # (B, C, L)
    ctx = rng.normal(size=(2, 6, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()

    variables = jax.tree.map(
        jnp.asarray, convert_spatial_transformer1d(tm.state_dict())
    )
    out = SpatialTransformer1D(
        heads=4, dim_head=16, use_zero_module=False
    ).apply(variables, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(ctx))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-4
    )


def test_spatial_transformer_1d_zero_module_is_identity():
    from diff_foley_tpu.models.attention import SpatialTransformer1D

    st = SpatialTransformer1D(heads=4, dim_head=16, use_zero_module=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 64)),
                    jnp.float32)
    v = st.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(st.apply(v, x)), np.asarray(x),
                               rtol=1e-6)


# --------------------------------------------------------------------------
# 1D audio UNet
# --------------------------------------------------------------------------

def test_audio_unet_forward_and_grad():
    from diff_foley_tpu.models.audio_unet import AudioUNetConfig, AudioUNetModel

    cfg = AudioUNetConfig(
        in_channels=8, out_channels=8, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        context_dim=24,
    )
    unet = AudioUNetModel(cfg)
    x = jnp.zeros((2, 16, 8))
    t = jnp.asarray([1.0, 5.0])
    ctx = jnp.zeros((2, 6, 24))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 8)
    # zero-init output conv → ε(0) = 0 at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def loss(p):
        return jnp.sum(unet.apply(p, x + 1.0, t, ctx) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


# --------------------------------------------------------------------------
# Sound VAE (1D waveform)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_sound():
    return load_ref_module(
        "ref_sound_model",
        "/root/reference/training/stage2_ldm/adm/modules/stage1_model/model.py",
    )


def test_sound_encoder_parity(ref_sound):
    from diff_foley_tpu.models.sound_vae import SoundEncoder, SoundVAEConfig
    from diff_foley_tpu.utils.convert import convert_sound_vae

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = ref_sound.Encoder()
            self.decoder = ref_sound.Decoder()

    tm = randomize_torch_model(Wrap(), seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 256)).astype(np.float32)
    with torch.no_grad():
        ref = tm.encoder(torch.from_numpy(x)).numpy()  # (B, 256, L/32)

    variables = jax.tree.map(jnp.asarray, convert_sound_vae(tm.state_dict()))
    out = SoundEncoder(SoundVAEConfig()).apply(
        {"params": variables["params"]["encoder"]},
        jnp.asarray(x.transpose(0, 2, 1)),
    )
    assert out.shape == ref.transpose(0, 2, 1).shape
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-4
    )


def test_sound_decoder_parity_and_roundtrip(ref_sound):
    from diff_foley_tpu.models.sound_vae import (
        SoundAutoencoderKL,
        SoundDecoder,
        SoundVAEConfig,
    )
    from diff_foley_tpu.utils.convert import convert_sound_vae

    class Wrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = ref_sound.Encoder()
            self.decoder = ref_sound.Decoder()

    tm = randomize_torch_model(Wrap(), seed=1)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 128, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm.decoder(torch.from_numpy(z)).numpy()  # (B, 1, 8·32)

    variables = jax.tree.map(jnp.asarray, convert_sound_vae(tm.state_dict()))
    out = SoundDecoder(SoundVAEConfig()).apply(
        {"params": variables["params"]["decoder"]},
        jnp.asarray(z.transpose(0, 2, 1)),
    )
    assert out.shape == ref.transpose(0, 2, 1).shape
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-4
    )

    # full KL roundtrip through the converted weights
    vae = SoundAutoencoderKL(SoundVAEConfig())
    wav = jnp.asarray(rng.normal(size=(1, 256, 1)), jnp.float32)
    rec, posterior = vae.apply(
        variables, wav, sample_posterior=False,
        method=lambda m, a, sample_posterior: m(
            a, sample_posterior=sample_posterior),
    )
    assert rec.shape == (1, 256, 1)
    assert posterior.mean.shape == (1, 8, 128)
    assert np.isfinite(np.asarray(rec)).all()


# --------------------------------------------------------------------------
# pos-emb UNet variant (openai_unetmodel_pos.py)
# --------------------------------------------------------------------------

def test_unet_pos_emb_variant():
    from diff_foley_tpu.models.unet import UNetConfig, UNetModel

    base = dict(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=(2,), num_heads=4, context_dim=24)
    x = jnp.zeros((1, 8, 16, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 6, 24))

    plain = UNetModel(UNetConfig(**base))
    posu = UNetModel(UNetConfig(**base, pos_seq_len=16))
    p_plain = plain.init(jax.random.PRNGKey(0), x, t, ctx)
    p_pos = posu.init(jax.random.PRNGKey(0), x, t, ctx)
    # pos variant has extra embedding tables
    n_plain = sum(a.size for a in jax.tree_util.tree_leaves(p_plain))
    n_pos = sum(a.size for a in jax.tree_util.tree_leaves(p_pos))
    assert n_pos > n_plain
    out = posu.apply(p_pos, x, t, ctx)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------
# text/class embedders
# --------------------------------------------------------------------------

def test_class_embedder():
    from diff_foley_tpu.models.cond_text import ClassEmbedder

    emb = ClassEmbedder(embed_dim=24, n_classes=10)
    v = emb.init(jax.random.PRNGKey(0), jnp.asarray([1, 3]))
    out = emb.apply(v, jnp.asarray([1, 3]))
    assert out.shape == (2, 1, 24)


def test_frozen_clip_text_embedder_random_config():
    from transformers import CLIPTextConfig

    from diff_foley_tpu.models.cond_text import FrozenCLIPTextEmbedder

    cfg = CLIPTextConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=77, vocab_size=1000)
    emb = FrozenCLIPTextEmbedder(config=cfg)
    ids = np.zeros((2, 77), np.int32)
    z = emb.encode_tokens(ids)
    assert z.shape == (2, 77, 32)
    assert np.isfinite(np.asarray(z)).all()


# --------------------------------------------------------------------------
# A/V mux guard
# --------------------------------------------------------------------------

def test_mux_guard_and_wav_writer(tmp_path):
    from diff_foley_tpu.video import mux

    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    p = mux.write_wav(str(tmp_path / "a.wav"), wav)
    from scipy.io import wavfile

    sr, pcm = wavfile.read(p)
    assert sr == 16000 and pcm.dtype == np.int16 and len(pcm) == 16000

    if mux.has_ffmpeg():  # pragma: no cover - image has no ffmpeg
        out = mux.mux_audio_video(
            "/root/reference/inference/demo_videos/gun.mp4", wav,
            str(tmp_path / "out.mp4"),
        )
        assert (tmp_path / "out.mp4").exists()
    else:
        with pytest.raises(RuntimeError, match="ffmpeg not found"):
            mux.mux_audio_video("x.mp4", wav, str(tmp_path / "out.mp4"))
