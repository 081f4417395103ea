"""Orbax checkpoint manager + align-acc metric on tiny models."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.eval.align_acc import alignment_accuracy
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.train.classifier import ClassifierTrainer
from diff_foley_tpu.utils.checkpoint import CheckpointManager


def test_checkpoint_save_restore_latest(tmp_path):
    state = {
        "params": {"w": jnp.arange(4.0), "b": jnp.zeros(2)},
        "step": jnp.asarray(7),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.latest_step() is None
    assert mgr.restore(state) is None
    mgr.save(1, state)
    state2 = jax.tree.map(lambda x: x + 1, state)
    mgr.save(2, state2)
    assert mgr.latest_step() == 2
    restored = mgr.restore(jax.tree.map(np.zeros_like, state))
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(4.0) + 1)
    # retention: max_to_keep=2 keeps both; a third save drops step 1
    mgr.save(3, state)
    assert mgr.latest_step() == 3


def test_alignment_accuracy_runs():
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1))
    trainer = ClassifierTrainer(
        backbone_cfg=UNetConfig(
            in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
            context_dim=24,
        ),
        vae=vae,
        cond_seq_len=32,
    )
    vae_params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 512, 3)))
    params = trainer.init_params(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    batches = [
        {
            "spec": rng.uniform(size=(2, 128, 512, 3)).astype(np.float32),
            "video_feat": rng.normal(size=(2, 32, 512)).astype(np.float32),
        }
        for _ in range(2)
    ]
    acc = alignment_accuracy(iter(batches), trainer, params, vae, vae_params)
    # zero-init head → sigmoid 0.5 → round → ties; accuracy in [0,1]
    assert 0.0 <= acc <= 1.0
