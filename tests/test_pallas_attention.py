"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.ops.attention import multi_head_attention
from diff_foley_tpu.ops import pallas_attention as pa


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU test platform."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize(
    "b,h,lq,lk,d",
    [
        (2, 4, 64, 64, 40),    # UNet level-2 self-attn head dim
        (1, 8, 256, 40, 80),   # cross-attn over 40 cond tokens
        (1, 2, 1024, 1024, 160),  # top-level self-attn
        (2, 2, 100, 30, 16),   # ragged everything
    ],
)
def test_pallas_matches_xla(b, h, lq, lk, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    scale = d**-0.5
    ref = pa._xla_reference(q, k, v, scale)
    out = pa.flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradient_matches_xla():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 32, 40)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 40)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 40)), jnp.float32)
    scale = 40**-0.5

    def loss_pallas(q, k, v):
        return jnp.sum(pa.flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(pa._xla_reference(q, k, v, scale) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_backend_switch(monkeypatch):
    from diff_foley_tpu.ops import attention as att

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)), jnp.float32)
    ref = multi_head_attention(q, q, q, backend="xla")
    out = multi_head_attention(q, q, q, backend="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    att.set_attention_backend("pallas")
    assert att.get_attention_backend() == "pallas"
    att.set_attention_backend("xla")
    with pytest.raises(AssertionError):
        att.set_attention_backend("nope")


@pytest.mark.parametrize(
    "b,h,lq,lk,d,dtype",
    [
        (1, 2, 1024, 1024, 40, jnp.float32),   # multi-chunk: qc=512, 2 chunks
        (2, 2, 256, 40, 80, jnp.float32),      # cross-attn, single chunk
        (1, 2, 1024, 1024, 40, jnp.bfloat16),  # train operating point dtype
    ],
)
def test_pallas_backward_matches_xla(b, h, lq, lk, d, dtype):
    """The fused backward kernel (dQ per chunk, dK/dV accumulated across
    revisited fp32 blocks) vs the XLA recompute formula."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), dtype)
    g = jnp.asarray(rng.normal(size=(b, h, lq, d)), dtype)
    scale = d**-0.5
    assert pa._bwd_q_chunk(pa._round_up(lq, 8), pa._round_up(lk, 128))
    out = pa._pallas_backward(q, k, v, g, scale)
    ref = pa._xla_bwd(scale, q, k, v, g)
    tol = 2e-4 if dtype == jnp.float32 else 6e-2
    for a, b_ in zip(out, ref):
        assert a.dtype == dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=tol, atol=tol,
        )


def test_backward_chunk_accumulation_exact():
    """dK/dV accumulated over 4 query chunks equals the one-shot formula to
    fp32 addition order — catches init/accumulate mistakes in the revisited
    output blocks."""
    rng = np.random.default_rng(4)
    lq, lk, d = 2048, 128, 40   # qc=512 -> 4 chunks
    q = jnp.asarray(rng.normal(size=(1, 1, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, lk, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 1, lq, d)), jnp.float32)
    out = pa._pallas_backward(q, k, v, g, d**-0.5)
    ref = pa._xla_bwd(d**-0.5, q, k, v, g)
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "b,heads,lq,lk,d",
    [
        (2, 8, 1024, 1024, 40),   # flagship level-1 self-attn (multi-chunk)
        (1, 8, 1024, 40, 40),     # level-1 cross-attn over 40 cond tokens
        (2, 8, 256, 256, 80),     # level-2 self-attn
        (1, 8, 64, 40, 160),      # level-3 cross-attn
        (2, 4, 100, 30, 16),      # ragged: forces the split-heads fallback
    ],
)
def test_packed_matches_xla(b, heads, lq, lk, d):
    """Packed (B, L, H·D) kernel — in-VMEM static head slices — vs the
    per-head XLA reference."""
    rng = np.random.default_rng(5)
    hd = heads * d
    q3 = jnp.asarray(rng.normal(size=(b, lq, hd)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(b, lk, hd)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(b, lk, hd)), jnp.float32)
    scale = d**-0.5
    ref = pa._merge_heads(pa._xla_reference(
        pa._split_heads(q3, heads), pa._split_heads(k3, heads),
        pa._split_heads(v3, heads), scale))
    out = pa.flash_attention_packed(q3, k3, v3, scale, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_entry_backends_agree():
    """ops.attention.multi_head_attention_packed: XLA backend equals the
    historical split+einsum path bit-for-bit; Pallas backend within fp
    tolerance."""
    from diff_foley_tpu.ops import attention as att

    rng = np.random.default_rng(6)
    heads, d = 4, 40
    q3 = jnp.asarray(rng.normal(size=(2, 64, heads * d)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(2, 24, heads * d)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(2, 24, heads * d)), jnp.float32)
    legacy = pa._merge_heads(multi_head_attention(
        pa._split_heads(q3, heads), pa._split_heads(k3, heads),
        pa._split_heads(v3, heads), backend="xla"))
    xla = att.multi_head_attention_packed(q3, k3, v3, heads, backend="xla")
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(legacy))
    pallas = att.multi_head_attention_packed(
        q3, k3, v3, heads, backend="pallas")
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla),
                               atol=2e-5)


@pytest.mark.parametrize(
    "b,heads,lq,lk,d",
    [
        (1, 2, 32, 16, 40),      # packed bwd kernel, single chunk
        (1, 8, 512, 512, 40),    # multi-chunk: dK/dV accumulation across qc
        (1, 8, 1024, 40, 40),    # cross-attn shape
        (2, 4, 100, 30, 16),     # ragged: split-heads fallback path
    ],
)
def test_packed_gradient_matches_xla(b, heads, lq, lk, d):
    """flash_attention_packed's vjp (packed Pallas backward kernel, or the
    split → per-head → merge fallback) vs differentiating the XLA
    reference on packed operands."""
    rng = np.random.default_rng(7)
    q3 = jnp.asarray(rng.normal(size=(b, lq, heads * d)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(b, lk, heads * d)), jnp.float32)
    v3 = jnp.asarray(rng.normal(size=(b, lk, heads * d)), jnp.float32)
    scale = d**-0.5

    def loss_packed(q, k, v):
        return jnp.sum(pa.flash_attention_packed(q, k, v, scale, heads) ** 2)

    def loss_ref(q, k, v):
        out = pa._merge_heads(pa._xla_reference(
            pa._split_heads(q, heads), pa._split_heads(k, heads),
            pa._split_heads(v, heads), scale))
        return jnp.sum(out ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q3, k3, v3)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_tiny_unet_pallas_backend_matches_xla():
    """Model-level integration: a tiny attention UNet forward under the
    Pallas backend (packed kernel, interpret mode) matches the XLA backend
    — pins the heads/scale wiring through CrossAttention, not just the op."""
    from diff_foley_tpu.models.unet import UNetConfig, UNetModel
    from diff_foley_tpu.ops import attention as att

    cfg = UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                     attention_resolutions=(2,), num_heads=4, context_dim=24)
    model = UNetModel(cfg)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 4)), jnp.float32)
    t = jnp.asarray([3.0, 7.0], jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 6, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)

    prev = att.get_attention_backend()
    try:
        att.set_attention_backend("xla")
        ref = model.apply(params, x, t, ctx)
        att.set_attention_backend("pallas")
        out = model.apply(params, x, t, ctx)
    finally:
        att.set_attention_backend(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
