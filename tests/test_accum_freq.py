"""Feature-cache gradient accumulation (--accum-freq) equivalence:
K-step accumulation over micro-batches must reproduce the FULL-batch
contrastive gradient exactly (train_wds_intra_contrast.py:115-151 semantics;
BN frozen for exactness — batch-stat updates are per-forward in both
implementations)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
from diff_foley_tpu.train.losses import intra_contrast_loss
from diff_foley_tpu.train.stage1_cavp import (
    LOG_100,
    Stage1TrainConfig,
    init_train_state,
    make_accum_train_step,
)

K, B, CLIP = 2, 2, 2


def _setup():
    model = CAVPModel(CAVPConfig())
    cfg = Stage1TrainConfig(clip_num=CLIP, intra_weight=1.0)
    state = init_train_state(
        model, jax.random.PRNGKey(0), cfg,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    )
    rng = np.random.default_rng(0)
    batches = {
        "video": jnp.asarray(
            rng.normal(size=(K, B, CLIP, 16, 16, 16, 3)), jnp.float32),
        "spec": jnp.asarray(
            rng.normal(size=(K, B, CLIP, 128, 256)), jnp.float32),
    }
    return model, cfg, state, batches


def _full_batch_params(model, cfg, state, batches, tx):
    """One SGD step on the exact full-batch gradient (train=False)."""

    def loss_fn(params):
        video = batches["video"].reshape(-1, 16, 16, 16, 3)
        spec = batches["spec"].reshape(-1, 128, 256)
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            video, spec, train=False,
        )
        losses = intra_contrast_loss(
            out["video_features"], out["spec_features"], out["logit_scale"],
            clip_num=cfg.clip_num, intra_weight=cfg.intra_weight,
        )
        return losses["total_loss"]

    grads = jax.grad(loss_fn)(state.params)
    updates, _ = tx.update(grads, tx.init(state.params), state.params)
    params = optax.apply_updates(state.params, updates)
    params = dict(params)
    params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOG_100)
    return params


def test_accum_equals_full_batch_gradient():
    model, cfg, state, batches = _setup()
    tx = optax.sgd(0.1)

    state = state._replace(opt_state=tx.init(state.params))
    step = jax.jit(make_accum_train_step(model, cfg, K, tx=tx, train=False))
    state_accum, metrics = step(state, batches, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

    params_full = _full_batch_params(model, cfg, state, batches, tx)

    flat_a = jax.tree_util.tree_leaves_with_path(state_accum.params)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(params_full))
    for path, leaf in flat_a:
        ref = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=2e-4, atol=2e-6,
            err_msg=str(path),
        )


def test_accum_step_train_mode_runs():
    """train=True path: BN stats advance once (pass 1) and the step yields
    finite metrics."""
    model, cfg, state, batches = _setup()
    step = jax.jit(make_accum_train_step(model, cfg, K, train=True))
    state2, metrics = step(state, batches, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # batch stats moved (pass 1 ran in train mode)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(state2.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    )


def test_cli_micro_batch_stacking():
    from diff_foley_tpu.cli.train_cavp import stack_micro_batches

    samples = [np.full((2, 3), i, np.float32) for i in range(6)]
    plain = stack_micro_batches(samples, accum_freq=1, batch_size=6)
    assert plain.shape == (6, 2, 3)
    micro = stack_micro_batches(samples, accum_freq=2, batch_size=3)
    assert micro.shape == (2, 3, 2, 3)
    # micro-batch j holds consecutive samples (order preserved)
    np.testing.assert_array_equal(micro[0, 0], samples[0])
    np.testing.assert_array_equal(micro[1, 0], samples[3])


def test_accum_mixed_precision_runs_and_agrees():
    """compute_dtype="bfloat16" composes with the feature-cache accumulation:
    caches/loss run fp32 over bf16 tower outputs, masters stay fp32, and the
    loss agrees with the fp32 accum step to bf16 tolerance."""
    model, cfg, state, batches = _setup()
    cfg16 = Stage1TrainConfig(clip_num=CLIP, intra_weight=1.0,
                              compute_dtype="bfloat16")
    step32 = jax.jit(make_accum_train_step(model, cfg, K, train=False))
    step16 = jax.jit(make_accum_train_step(model, cfg16, K, train=False))
    _, m32 = step32(state, batches, jax.random.PRNGKey(1))
    s16, m16 = step16(state, batches, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m16["total_loss"]),
                               float(m32["total_loss"]), rtol=0.05)
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
