"""Remat save-policy knob: gradients are identical under every policy.

`UNetConfig.remat_policy` only changes WHAT the rematted transformer blocks
keep from the forward pass (memory/recompute trade), never the math — so
loss and gradients must match the no-remat baseline bit-for-bit-ish.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.models.unet import UNetConfig, UNetModel

TINY = UNetConfig(
    model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(1, 2), num_heads=4, context_dim=24,
)


def _loss_grads(cfg):
    m = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 4))
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24))
    p = UNetModel(dataclasses.replace(cfg, use_checkpoint=False)).init(
        jax.random.PRNGKey(2), x, t, ctx
    )

    def loss(p):
        return jnp.mean(m.apply(p, x, t, ctx) ** 2)

    l, g = jax.jit(jax.value_and_grad(loss))(p)
    return float(l), g


@pytest.mark.parametrize("policy", ["none", "dots", "dots_no_batch"])
def test_remat_policy_grads_match_no_remat(policy):
    l0, g0 = _loss_grads(TINY)
    l1, g1 = _loss_grads(
        dataclasses.replace(TINY, use_checkpoint=True, remat_policy=policy)
    )
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )
