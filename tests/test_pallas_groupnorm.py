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


@pytest.mark.parametrize(
    "b,h,w,c,dtype",
    [
        (2, 16, 512, 256, jnp.float32),   # f32 rows: 512 KB -> 4 row-chunks
        (2, 32, 512, 128, jnp.bfloat16),  # bf16 VAE decoder shape (scaled)
    ],
)
def test_streaming_groupnorm_matches_xla(b, h, w, c, dtype):
    """The HBM-streaming two-kernel pass (stats accumulate + affine apply)
    against the reference formula, across multiple row-chunks per image."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 1.5, dtype)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    assert pg._stream_chunk_rows(h, w, c, x.dtype.itemsize) < h  # >1 chunk
    out = pg._streaming_forward(x, gamma, beta, 32, 1e-6, "silu")
    assert out.dtype == dtype
    ref = pg._xla_group_norm(x, gamma, beta, 32, 1e-6, "silu")
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_dispatch_streams_oversize_maps():
    """Public entry under the "pallas-stream" backend: VMEM-resident maps
    keep the XLA formula bit-for-bit; HBM-resident maps stream and stay
    correct."""
    rng = np.random.default_rng(5)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)

    small = jnp.asarray(rng.normal(size=(2, 8, 16, 128)), jnp.float32)
    big = jnp.asarray(rng.normal(size=(1, 128, 256, 128)), jnp.float32)
    assert not pg.fits_vmem(big.shape)
    assert pg.stream_eligible(big.shape, 32, 4)

    pg.set_groupnorm_backend("pallas-stream")
    out_small = pg.fused_group_norm(small, gamma, beta, 32, 1e-6, "silu")
    out_big = pg.fused_group_norm(big, gamma, beta, 32, 1e-6, "silu")
    pg.set_groupnorm_backend("xla")
    np.testing.assert_array_equal(
        np.asarray(out_small),
        np.asarray(pg._xla_group_norm(small, gamma, beta, 32, 1e-6, "silu")),
    )
    np.testing.assert_allclose(
        np.asarray(out_big),
        np.asarray(pg._xla_group_norm(big, gamma, beta, 32, 1e-6, "silu")),
        rtol=2e-5, atol=2e-5,
    )


def test_vae_gn_param_tree_backend_invariant():
    """VAE blocks create the same param tree under both backends, so one
    checkpoint serves the XLA and Pallas paths (converter compatibility)."""
    from diff_foley_tpu.models.vae import VAEResnetBlock

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
    mod = VAEResnetBlock(64)

    pg.set_groupnorm_backend("xla")
    p_xla = mod.init(jax.random.PRNGKey(0), x)
    out_xla = mod.apply(p_xla, x)
    pg.set_groupnorm_backend("pallas")
    p_pl = mod.init(jax.random.PRNGKey(0), x)
    out_pl = mod.apply(p_xla, x)
    pg.set_groupnorm_backend("xla")
    assert jax.tree_util.tree_structure(p_xla) == jax.tree_util.tree_structure(p_pl)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-5, atol=2e-5)
