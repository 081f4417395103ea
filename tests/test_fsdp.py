"""FSDP/ZeRO-style fully-sharded training state over the `data` axis.

New capability beyond the reference (which replicates params + Adam state on
every DDP rank — SURVEY.md §2.8). Checks: (1) the FSDP layout actually shards
large leaves (per-device shards are smaller than the global array), (2) one
FSDP train step is numerically identical to the replicated step, (3) the spec
chooser composes with tensor-parallel base specs.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.parallel.mesh import make_mesh
from diff_foley_tpu.parallel.sharding_rules import (
    fsdp_shardings,
    fsdp_spec,
    shard_state_fsdp,
)
from diff_foley_tpu.train.stage2_ldm import (
    Stage2TrainConfig,
    init_train_state,
    make_train_step,
)

TINY = LDMConfig(
    unet=UNetConfig(
        model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(2,), num_heads=4, context_dim=24,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
    cond_embed_dim=24,
    cond_seq_len=8,
)


def _batch(key, b=16):
    k1, k2 = jax.random.split(key)
    return {
        "spec": jax.random.uniform(k1, (b, 32, 64, 3)),
        "video_feat": jax.random.normal(k2, (b, 8, 512)),
    }


def test_fsdp_spec_rules():
    # largest divisible dim gets the data axis
    assert fsdp_spec((3, 3, 256, 512), 8, min_size=1) == P(None, None, None, "data")
    # dims not divisible by the shard count are skipped
    assert fsdp_spec((7, 512), 8, min_size=1) == P(None, "data")
    # nothing divisible → replicated
    assert fsdp_spec((7, 9), 8, min_size=1) == P()
    # small leaves replicate
    assert fsdp_spec((4, 4), 8, min_size=2**15) == P()
    # scalars replicate
    assert fsdp_spec((), 8, min_size=0) == P()
    # composes with a TP base spec: data lands on a free dim
    assert fsdp_spec((256, 512), 8, base=P(None, "model"), min_size=1) == P(
        "data", "model"
    )
    # TP owns the only divisible dim → keep TP only
    assert fsdp_spec((7, 512), 8, base=P(None, "model"), min_size=1) == P(
        None, "model"
    )


def test_fsdp_step_matches_replicated(eight_devices):
    ldm = LatentDiffusion(TINY)
    cfg = Stage2TrainConfig(warmup_steps=1, use_ema=True, mu_dtype="bfloat16")
    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    state0 = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    vae_params = jax.device_put(ldm.init_vae_params(jax.random.PRNGKey(1)), repl)
    batch = jax.device_put(_batch(jax.random.PRNGKey(2)), dsh)
    rng = jax.device_put(jax.random.PRNGKey(3), repl)

    state_f, state_sh = shard_state_fsdp(state0, mesh, min_size=1024)
    # the layout must actually shard something: some param leaf's local
    # shard is smaller than the global array
    sharded_leaves = [
        leaf
        for leaf in jax.tree.leaves(state_f.params)
        if leaf.addressable_shards[0].data.size < leaf.size
    ]
    assert sharded_leaves, "FSDP layout sharded no parameter"
    # Adam moments follow the same rule (mu mirrors param shapes)
    mu_sharded = [
        leaf
        for leaf in jax.tree.leaves(state_f.opt_state)
        if hasattr(leaf, "addressable_shards")
        and leaf.addressable_shards[0].data.size < leaf.size
    ]
    assert mu_sharded, "FSDP layout sharded no optimizer leaf"

    step_f = jax.jit(
        make_train_step(ldm, cfg),
        in_shardings=(state_sh, repl, dsh, repl),
        out_shardings=(state_sh, repl),
    )
    with mesh:
        state_f1, mf = step_f(state_f, vae_params, batch, rng)

    state_r = jax.device_put(state0, repl)
    step_r = jax.jit(
        make_train_step(ldm, cfg),
        in_shardings=(repl, repl, dsh, repl),
        out_shardings=(repl, repl),
    )
    with mesh:
        state_r1, mr = step_r(state_r, vae_params, batch, rng)

    np.testing.assert_allclose(
        float(mf["loss"]), float(mr["loss"]), rtol=1e-6
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        state_f1.params, state_r1.params,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5
    ema_diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state_f1.ema.params, state_r1.ema.params,
    )
    assert max(jax.tree.leaves(ema_diffs)) < 1e-5


def test_fsdp_composes_with_tensor_parallel(eight_devices):
    from diff_foley_tpu.parallel.sharding_rules import param_shardings

    ldm = LatentDiffusion(TINY)
    cfg = Stage2TrainConfig(warmup_steps=1)
    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    state0 = init_train_state(ldm, jax.random.PRNGKey(0), cfg)
    tp = param_shardings(state0.params["unet"], mesh)
    fsdp = fsdp_shardings(
        state0.params["unet"], mesh, min_size=1024, base_specs=tp
    )
    # every TP-owned dim is preserved
    def check(sh_tp, sh_f):
        tp_spec, f_spec = sh_tp.spec, sh_f.spec
        for i, ax in enumerate(tp_spec):
            if ax is not None:
                assert f_spec[i] == ax
    jax.tree.map(check, tp, fsdp)

    unet_p = jax.tree.map(jax.device_put, state0.params["unet"], fsdp)
    state_f = state0._replace(params={
        "unet": unet_p,
        "cond": jax.device_put(state0.params["cond"], repl),
    })
    vae_params = jax.device_put(ldm.init_vae_params(jax.random.PRNGKey(1)), repl)
    batch = jax.device_put(_batch(jax.random.PRNGKey(2)), dsh)
    rng = jax.device_put(jax.random.PRNGKey(3), repl)
    step = jax.jit(make_train_step(ldm, cfg))
    with mesh:
        state1, m = step(state_f, vae_params, batch, rng)
    assert np.isfinite(float(m["loss"]))
    assert int(state1.step) == 1
