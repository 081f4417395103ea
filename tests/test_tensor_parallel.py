"""Tensor-parallel sharding rules: numerics identical to replicated."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh
from diff_foley_tpu.parallel.sharding_rules import param_shardings
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(1, 2), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=8,
)


def test_tp_sharding_rules_cover_attention(eight_devices):
    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    sh = param_shardings(params["unet"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    tp = [
        "/".join(str(k) for k in path)
        for path, s in flat
        if s.spec != P()
    ]
    assert any("to_q" in p for p in tp)
    assert any("to_out" in p for p in tp)
    assert any("geglu" in p for p in tp)
    assert any("time_embed" in p for p in tp)


def test_tp_step_matches_replicated(eight_devices):
    ldm = LatentDiffusion(TINY)
    cfg = Stage2TrainConfig(warmup_steps=1)
    batch = {
        "spec": jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 64, 3)),
        "video_feat": jax.random.normal(jax.random.PRNGKey(2), (8, 8, 512)),
    }
    rng = jax.random.PRNGKey(3)

    # replicated single-device baseline
    state0 = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    vae0 = ldm.init_vae_params(jax.random.PRNGKey(4))
    s_ref, m_ref = jax.jit(make_train_step(ldm, cfg))(state0, vae0, batch, rng)

    # dp=4 × tp=2 mesh
    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    state = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    unet_sh = param_shardings(state.params["unet"], mesh)
    state = state._replace(params={
        "unet": jax.tree.map(jax.device_put, state.params["unet"], unet_sh),
        "cond": jax.device_put(state.params["cond"], repl),
    })
    state = state._replace(
        step=jax.device_put(state.step, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
    with mesh:
        s_tp, m_tp = jax.jit(make_train_step(ldm, cfg))(
            state, jax.device_put(vae0, repl), jax.device_put(batch, dsh),
            jax.device_put(rng, repl),
        )
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5)
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()),
        jax.device_get(s_tp.params), jax.device_get(s_ref.params),
    )
    assert max(jax.tree.leaves(diff)) < 1e-4
