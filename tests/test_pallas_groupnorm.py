"""Fused Pallas GroupNorm(+SiLU) vs the XLA reference (interpret mode on
CPU), plus the GroupNorm32 module contract: identical param tree and
identical default-backend behaviour."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.ops import pallas_groupnorm as pg


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)
    pg.set_groupnorm_backend("xla")


@pytest.mark.parametrize(
    "b,h,w,c,groups,act",
    [
        (2, 16, 64, 320, 32, "silu"),   # UNet level-0 ResBlock norm
        (2, 8, 32, 640, 32, "silu"),
        (1, 2, 8, 1280, 32, None),      # deepest level, no act
        (2, 4, 4, 64, 32, "silu"),      # tiny toy widths
    ],
)
def test_pallas_groupnorm_matches_xla(b, h, w, c, groups, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 2.0, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    ref = pg._xla_group_norm(x, gamma, beta, groups, 1e-5, act)
    out = pg._pallas_forward(x, gamma, beta, groups, 1e-5, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_groupnorm_bf16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)), jnp.bfloat16)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    out = pg._pallas_forward(x, gamma, beta, 32, 1e-5, "silu")
    assert out.dtype == jnp.bfloat16
    ref = pg._xla_group_norm(x, gamma, beta, 32, 1e-5, "silu")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_group_norm_gradient_matches_xla():
    """custom_vjp backward (XLA recompute) vs direct autodiff of the
    reference formula."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(pg.fused_group_norm(x, g, b, 32, 1e-5, "silu") ** 2)

    def loss_ref(x, g, b):
        return jnp.sum(pg._xla_group_norm(x, g, b, 32, 1e-5, "silu") ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_groupnorm32_module_same_tree_and_switch():
    """GroupNorm32: the pallas backend creates the SAME param tree as the
    xla backend (checkpoint compatibility), and its output matches."""
    from diff_foley_tpu.models.layers import GroupNorm32

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 64)), jnp.float32)
    mod = GroupNorm32(act="silu")

    pg.set_groupnorm_backend("xla")
    p_xla = mod.init(jax.random.PRNGKey(0), x)
    out_xla = mod.apply(p_xla, x)

    pg.set_groupnorm_backend("pallas")
    p_pl = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_xla) == jax.tree_util.tree_structure(p_pl)
    out_pl = mod.apply(p_xla, x)
    pg.set_groupnorm_backend("xla")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-5, atol=2e-5)


def test_oversize_map_falls_back():
    """VAE-scale maps exceed VMEM → fused_group_norm must take the XLA
    path (still correct, no crash)."""
    assert not pg.fits_vmem((1, 128, 512, 128))
    x = jnp.ones((1, 16, 16, 64), jnp.float32)
    # fits → pallas; just sanity-run through the public entry
    out = pg.fused_group_norm(
        x, jnp.ones((64,)), jnp.zeros((64,)), 32, 1e-5, None
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-4)
