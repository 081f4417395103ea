"""Taming decoder variants: SimpleDecoder / UpsampleDecoder / LatentRescaler
parity vs the reference torch modules (stage1_autoencoder/model.py:666-780)
with converted random weights, plus the IdentityFirstStage pass-through."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# diff_foley.util imports omegaconf — stub it like test_torch_parity does
if "omegaconf" not in sys.modules:
    fake_oc = types.ModuleType("omegaconf")

    class ListConfig(list):
        pass

    fake_oc.OmegaConf = object
    fake_oc.ListConfig = ListConfig
    fake_lc = types.ModuleType("omegaconf.listconfig")
    fake_lc.ListConfig = ListConfig
    fake_oc.listconfig = fake_lc
    sys.modules["omegaconf"] = fake_oc
    sys.modules["omegaconf.listconfig"] = fake_lc
sys.path.insert(0, "/root/reference")

from ref_stubs import randomize_torch_model  # noqa: E402

from diff_foley_tpu.models.vae import (  # noqa: E402
    IdentityFirstStage,
    LatentRescaler,
    SimpleDecoder,
    UpsampleDecoder,
)
from diff_foley_tpu.utils.convert import (  # noqa: E402
    convert_latent_rescaler,
    convert_simple_decoder,
    convert_upsample_decoder,
)

RTOL, ATOL = 1e-4, 2e-4


@pytest.fixture(scope="module")
def ref():
    import diff_foley.modules.stage1_autoencoder.model as m

    return m


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_simple_decoder_parity(ref):
    tm = randomize_torch_model(ref.SimpleDecoder(32, 3), seed=0)
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = _nhwc(tm(_nchw(x)))
    params = jax.tree.map(jnp.asarray, convert_simple_decoder(tm.state_dict()))
    out = SimpleDecoder(32, 3).apply(params, jnp.asarray(x))
    assert out.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=RTOL, atol=ATOL)


def test_upsample_decoder_parity(ref):
    kw = dict(in_channels=32, out_channels=3, ch=32, num_res_blocks=1,
              resolution=32, ch_mult=(1, 2))
    tm = randomize_torch_model(ref.UpsampleDecoder(**kw), seed=1)
    x = np.random.default_rng(1).normal(size=(2, 4, 4, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = _nhwc(tm(_nchw(x)))
    params = jax.tree.map(
        jnp.asarray,
        convert_upsample_decoder(tm.state_dict(), in_channels=32, ch=32,
                                 num_res_blocks=1, ch_mult=(1, 2)),
    )
    out = UpsampleDecoder(out_channels=3, ch=32, num_res_blocks=1,
                          ch_mult=(1, 2)).apply(params, jnp.asarray(x))
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("factor", [2.0, 0.5, 1.5])
def test_latent_rescaler_parity(ref, factor):
    tm = randomize_torch_model(
        ref.LatentRescaler(factor=factor, in_channels=8, mid_channels=32,
                           out_channels=4, depth=2), seed=2,
    )
    x = np.random.default_rng(2).normal(size=(2, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        out_ref = _nhwc(tm(_nchw(x)))
    params = jax.tree.map(
        jnp.asarray, convert_latent_rescaler(tm.state_dict(), depth=2)
    )
    out = LatentRescaler(factor=factor, mid_channels=32, out_channels=4,
                         depth=2).apply(params, jnp.asarray(x))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=RTOL, atol=ATOL)


def test_identity_first_stage():
    fs = IdentityFirstStage()
    x = jnp.ones((2, 3))
    assert fs.encode(x) is x and fs.decode(x) is x and fs(x) is x
    assert fs.quantize(x) is x
    fs_vq = IdentityFirstStage(vq_interface=True)
    q, _, extra = fs_vq.quantize(x)
    assert q is x and extra == [None, None, None]
