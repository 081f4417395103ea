"""Alignment-classifier trainer plumbing: the BCE train step runs, yields
finite loss/metrics, and advances state on random data.

This is a wiring smoke test only — it does NOT prove learning. The learning
proof (held-out accuracy >> 0.5 chance on a learnable synthetic AV task)
lives in tests/test_learning.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.train.classifier import ClassifierTrainer


def test_classifier_train_step():
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
    trainer = ClassifierTrainer(
        backbone_cfg=UNetConfig(
            in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
            context_dim=24,
        ),
        vae=vae,
        cond_seq_len=8,
    )
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    state = trainer.init_train_state(jax.random.PRNGKey(1))
    step = jax.jit(trainer.make_train_step(vae_params))

    rng = np.random.default_rng(0)
    batch = {
        "spec": jnp.asarray(rng.uniform(size=(4, 128, 512, 3)), jnp.float32),
        "video_feat": jnp.asarray(rng.normal(size=(4, 8, 512)), jnp.float32),
        "labels": jnp.asarray([1, 0, 1, 0]),
    }
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["bce_loss"]))
    assert 0.0 <= float(m["acc"]) <= 1.0
    assert int(state.step) == 3
