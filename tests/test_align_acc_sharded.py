"""Align-acc eval sharded over an 8-device data mesh (reference DDP-eval
equivalent, evaluation/align_acc.py:137) — must match the single-device
result exactly, including ragged last batches (padded+masked)."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.eval.align_acc import alignment_accuracy, make_align_acc_fn
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh
from diff_foley_tpu.train.classifier import ClassifierTrainer


def _tiny():
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
    params = trainer.init_params(jax.random.PRNGKey(1))
    return vae, trainer, vae_params, params


def test_align_acc_sharded_matches_single(eight_devices):
    vae, trainer, vae_params, params = _tiny()
    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)

    rng = np.random.default_rng(0)
    # ragged batches: 8 (even) and 5 (padded to 8, mask drops 3 rows)
    batches = [
        {
            "spec": rng.uniform(size=(n, 32, 64, 3)).astype(np.float32),
            "video_feat": rng.normal(size=(n, 8, 512)).astype(np.float32),
        }
        for n in (8, 5)
    ]
    acc_single = alignment_accuracy(
        iter(batches), trainer, params, vae, vae_params
    )
    acc_sharded = alignment_accuracy(
        iter(batches), trainer, params, vae, vae_params, mesh=mesh
    )
    assert acc_sharded == acc_single


def test_align_acc_fn_outputs_replicated(eight_devices):
    vae, trainer, vae_params, params = _tiny()
    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    fn = make_align_acc_fn(trainer, vae, vae_params, mesh=mesh)
    spec = jnp.zeros((8, 32, 64, 3))
    feat = jnp.zeros((8, 8, 512))
    valid = jnp.ones((8,), jnp.int32)
    c, t = fn(params, spec, feat, valid)
    assert int(t) == 8
    assert 0 <= int(c) <= 8
    # scalars came back fully replicated (global psum, not per-shard counts)
    assert c.sharding.is_fully_replicated
