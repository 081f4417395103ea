"""Device-resident scanned training (train/scan.py).

`scan_train` must be a pure refactor of the host-driven loop: K scanned
steps == K sequential `step_fn` calls — identical per-step metrics (rtol
1e-6; both trainers fold their RNG by `state.step`, so a single key is
safe across the scan) and matching final params. Params are compared at
atol 1e-4, not bitwise: the scanned body and the standalone jit fuse
differently, and Adam's g/sqrt(v) normalisation amplifies float32
rounding on near-zero-gradient leaves. Also covers the index_fn
resident-dataset gather."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
from diff_foley_tpu.train.classifier import (
    ClassifierTrainConfig,
    ClassifierTrainer,
)
from diff_foley_tpu.train.scan import scan_train

TINY_VAE = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)


def _trainer():
    return ClassifierTrainer(
        backbone_cfg=UNetConfig(
            out_channels=1, model_channels=32, num_res_blocks=1,
            channel_mult=(1, 2), attention_resolutions=(2,),
            num_heads=2, context_dim=16,
        ),
        vae=AutoencoderKL(TINY_VAE),
        cfg=ClassifierTrainConfig(lr=1e-3),
        cond_seq_len=4,
    )


def test_scan_train_equals_sequential_steps():
    trainer = _trainer()
    vae_params = trainer.vae.init(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 16, 32, 3)))
    # init at the latent geometry of the 16x32 spec (÷2 per ch_mult level)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "backbone": trainer.backbone.init(
            k1, jnp.zeros((1, 8, 16, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 4, 16))),
        "cond": trainer.cond_encoder.init(k2, jnp.zeros((1, 4, 512))),
    }
    from diff_foley_tpu.train.classifier import ClassifierTrainState

    state0 = ClassifierTrainState(
        jnp.asarray(0, jnp.int32), params, trainer.tx.init(params))

    step_fn = trainer.make_train_step(vae_params)
    K, B = 4, 2
    rng_np = np.random.default_rng(0)
    batches = {
        "z_mu": jnp.asarray(rng_np.normal(size=(K, B, 8, 16, 4)),
                            jnp.float32),
        "z_sigma": jnp.asarray(
            rng_np.uniform(0.1, 0.5, (K, B, 8, 16, 4)), jnp.float32),
        "video_feat": jnp.asarray(rng_np.normal(size=(K, B, 4, 512)),
                                  jnp.float32),
        "labels": jnp.asarray(rng_np.integers(0, 2, (K, B)), jnp.int32),
    }
    rng = jax.random.PRNGKey(7)

    # sequential host loop
    state_seq = state0
    seq_metrics = []
    for k in range(K):
        state_seq, m = jax.jit(step_fn)(
            state_seq, jax.tree.map(lambda x: x[k], batches), rng)
        seq_metrics.append(float(m["bce_loss"]))

    # one scanned program
    state_scan, metrics = jax.jit(
        lambda st, xs, key: scan_train(step_fn, st, xs, key)
    )(state0, batches, rng)

    assert int(state_scan.step) == K
    np.testing.assert_allclose(
        np.asarray(metrics["bce_loss"]), np.asarray(seq_metrics), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_seq.params),
                    jax.tree.leaves(state_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)


def test_scan_train_index_fn_gather():
    """index_fn gathers batches from a device-resident dataset; result
    equals feeding the gathered batches directly."""
    trainer = _trainer()
    vae_params = trainer.vae.init(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 16, 32, 3)))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "backbone": trainer.backbone.init(
            k1, jnp.zeros((1, 8, 16, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 4, 16))),
        "cond": trainer.cond_encoder.init(k2, jnp.zeros((1, 4, 512))),
    }
    from diff_foley_tpu.train.classifier import ClassifierTrainState

    state0 = ClassifierTrainState(
        jnp.asarray(0, jnp.int32), params, trainer.tx.init(params))
    step_fn = trainer.make_train_step(vae_params)

    N, K, B = 6, 3, 2
    rng_np = np.random.default_rng(1)
    MU = jnp.asarray(rng_np.normal(size=(N, 8, 16, 4)), jnp.float32)
    SG = jnp.asarray(rng_np.uniform(0.1, 0.5, (N, 8, 16, 4)), jnp.float32)
    FEAT = jnp.asarray(rng_np.normal(size=(N, 4, 512)), jnp.float32)
    idx = jnp.asarray(rng_np.integers(0, N, (K, B)), jnp.int32)
    labels = jnp.asarray(rng_np.integers(0, 2, (K, B)), jnp.int32)
    rng = jax.random.PRNGKey(9)

    def index_fn(xs, step):
        return {"z_mu": MU[xs["i"]], "z_sigma": SG[xs["i"]],
                "video_feat": FEAT[xs["i"]], "labels": xs["l"]}

    st_a, m_a = jax.jit(lambda st, xs, key: scan_train(
        step_fn, st, xs, key, index_fn=index_fn))(
            state0, {"i": idx, "l": labels}, rng)

    direct = {"z_mu": MU[idx], "z_sigma": SG[idx],
              "video_feat": FEAT[idx], "labels": labels}
    st_b, m_b = jax.jit(lambda st, xs, key: scan_train(
        step_fn, st, xs, key))(state0, direct, rng)

    np.testing.assert_allclose(np.asarray(m_a["bce_loss"]),
                               np.asarray(m_b["bce_loss"]), rtol=1e-6)
