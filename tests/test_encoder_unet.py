"""EncoderUNetModel pool-head variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.models.unet import EncoderUNetModel, UNetConfig

CFG = UNetConfig(
    in_channels=4, out_channels=10, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
    context_dim=24,
)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_pools(pool):
    m = EncoderUNetModel(CFG, pool=pool)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 4))
    t = jnp.asarray([0.0, 500.0])
    p = m.init(jax.random.PRNGKey(1), x, t)
    out = m.apply(p, x, t)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()
    if pool == "adaptive":
        # zero-init head → exactly zero logits at init (guided-diffusion
        # convention)
        np.testing.assert_allclose(np.asarray(out), 0.0)
