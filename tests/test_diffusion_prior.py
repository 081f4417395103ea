"""Stage-3 diffusion prior: loss learns, sampling converges, CFG masks work."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diff_foley_tpu.models.prior import DiffusionPrior, PriorConfig

CFG = PriorConfig(dim=32, seq_len=4, depth=2, heads=4, num_timesteps=100)


def test_prior_network_shapes_and_cfg_mask():
    prior = DiffusionPrior(CFG)
    params = prior.init_params(jax.random.PRNGKey(0))
    b = 3
    z = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 32))
    t = jnp.zeros((b,))
    keep = jnp.ones((b,), bool)
    drop = jnp.zeros((b,), bool)
    out_keep = prior.net.apply(params, z, t, v, keep, keep)
    assert out_keep.shape == (b, 4, 32)
    # dropping the video conditioning must change the output (null embeds)
    out_drop = prior.net.apply(params, z, t, v, drop, keep)
    assert float(jnp.abs(out_keep - out_drop).max()) > 1e-4
    # and dropped output is independent of the video input
    v2 = jax.random.normal(jax.random.PRNGKey(3), (b, 4, 32))
    out_drop2 = prior.net.apply(params, z, t, v2, drop, keep)
    np.testing.assert_allclose(np.asarray(out_drop), np.asarray(out_drop2),
                               atol=1e-6)


def test_prior_trains_and_samples():
    prior = DiffusionPrior(CFG)
    params = prior.init_params(jax.random.PRNGKey(0))
    # toy task: spec feats are a fixed linear map of video feats
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(32, 32)) * 0.3, jnp.float32)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, key):
        kv, kl = jax.random.split(key)
        v = jax.random.normal(kv, (16, 4, 32))
        s = v @ W

        def loss_fn(p):
            return prior.p_losses(p, v, s, kl, video_drop_prob=0.1,
                                  spec_drop_prob=1.0)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(60):
        params, opt, loss = train_step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])

    # sampling: prediction should correlate with the target mapping
    v = jax.random.normal(jax.random.PRNGKey(999), (8, 4, 32))
    target = v @ W
    samp = prior.sample(params, v, jax.random.PRNGKey(1000), steps=25,
                        cond_scale=1.0)
    assert samp.shape == target.shape
    err_model = float(jnp.mean((samp - target) ** 2))
    err_null = float(jnp.mean(target**2))
    assert err_model < err_null, (err_model, err_null)
