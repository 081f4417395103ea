"""Data-parallel inference: the sampler sharded over the data axis matches
single-device results — the multi-chip serving scaling story."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh

TINY = LDMConfig(
    unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                    attention_resolutions=(2,), num_heads=4, context_dim=24),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
    cond_embed_dim=24, cond_seq_len=8,
)


def test_sharded_sampling_matches_single_device(eight_devices):
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 512))
    x_T = jax.random.normal(jax.random.PRNGKey(2), (8, 16, 64, 4))

    def sample(p, f, xT):
        return ldm.sample(p, f, jax.random.PRNGKey(3), sampler="dpm", steps=4,
                          cfg_scale=4.5, x_T=xT)

    ref = jax.jit(sample)(params, feats, x_T)

    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    with mesh:
        out = jax.jit(sample, in_shardings=(repl, dsh, dsh),
                      out_shardings=dsh)(
            jax.device_put(params, repl), jax.device_put(feats, dsh),
            jax.device_put(x_T, dsh),
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
