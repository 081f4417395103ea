"""LPIPS / LPAPS parity vs the actual reference torch modules (random
weights — pretrained checkpoints can't download in this environment), plus
the VAE-trainer wiring of the perceptual term."""
import sys
import types

import importlib
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_stubs import (  # noqa: E402
    install_torchvision_stub,
    load_ref_module,
    randomize_torch_model,
)

LPIPS_PATH = (
    "/root/reference/training/stage2_ldm/adm/modules/losses/taming/lpips.py"
)
LPAPS_PATH = "/root/reference/training/stage2_ldm/adm/modules/losses/lpaps.py"
VGGISHISH_PATH = (
    "/root/reference/training/stage2_ldm/adm/modules/perceptual/model.py"
)


@pytest.fixture(scope="module")
def ref_lpips():
    install_torchvision_stub()  # zero-egress: weightless VGG16 features
    mod = load_ref_module("ref_lpips", LPIPS_PATH)
    mod.LPIPS.load_from_pretrained = lambda self, *a, **k: None
    return mod


@pytest.fixture(scope="module")
def ref_lpaps(ref_lpips):
    vgm = load_ref_module("ref_vggishish", VGGISHISH_PATH)
    # stub the adm package imports that lpaps.py expects
    adm = types.ModuleType("adm")
    modules = types.ModuleType("adm.modules")
    perceptual = types.ModuleType("adm.modules.perceptual")
    model = types.ModuleType("adm.modules.perceptual.model")
    util = types.ModuleType("adm.util")
    model.VGGishish = vgm.VGGishish

    import tempfile

    rng = np.random.default_rng(7)
    stats = np.stack(
        [rng.uniform(0.2, 0.8, 80), rng.uniform(0.1, 0.5, 80)], axis=1
    ).astype(np.float32)
    f = tempfile.NamedTemporaryFile(suffix=".txt", delete=False, mode="w")
    np.savetxt(f.name, stats)
    util.get_ckpt_path = lambda name, root=None: f.name
    for name, m in [
        ("adm", adm), ("adm.modules", modules),
        ("adm.modules.perceptual", perceptual),
        ("adm.modules.perceptual.model", model), ("adm.util", util),
    ]:
        sys.modules[name] = m
    mod = load_ref_module("ref_lpaps", LPAPS_PATH)
    mod.LPAPS.load_from_pretrained = lambda self, *a, **k: None

    def _vggishish_nockpt(self, pretrained=True):
        conv_layers = [64, 64, "MP", 128, 128, "MP", 256, 256, 256, "MP",
                       512, 512, 512, "MP", 512, 512, 512]
        return vgm.VGGishish(conv_layers, use_bn=False, num_classes=309)

    mod.vggishish16.vggishish16 = _vggishish_nockpt
    return mod


def test_lpips_parity(ref_lpips):
    from diff_foley_tpu.train.perceptual import LPIPS
    from diff_foley_tpu.utils.convert import convert_lpips

    tm = randomize_torch_model(ref_lpips.LPIPS(use_dropout=True), seed=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()[:, 0, 0, 0]

    variables = jax.tree.map(jnp.asarray, convert_lpips(tm.state_dict()))
    out = LPIPS().apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # identical inputs → zero distance
    z = LPIPS().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-6)


def test_lpaps_parity(ref_lpaps):
    from diff_foley_tpu.train.perceptual import LPAPS
    from diff_foley_tpu.utils.convert import convert_lpaps

    tm = randomize_torch_model(ref_lpaps.LPAPS(use_dropout=True), seed=1)
    rng = np.random.default_rng(1)
    # reference protocol: (B, 1, F=80, T) spec pairs in [-1, 1]
    x = rng.uniform(-1, 1, (2, 1, 80, 96)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 1, 80, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()[:, 0, 0, 0]

    variables = jax.tree.map(jnp.asarray, convert_lpaps(tm.state_dict()))
    out = LPAPS(n_freq=80).apply(
        variables, jnp.asarray(x[:, 0]), jnp.asarray(y[:, 0])
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_vae_trainer_with_lpips_term():
    """The perceptual hook produces a non-zero term that moves the VAE loss
    (VERDICT round-1 item 4: LPIPSWithDiscriminator-equivalent wiring)."""
    from diff_foley_tpu.train.perceptual import LPIPS, make_lpips_fn
    from diff_foley_tpu.train.vae_losses import VAELossConfig, generator_loss
    from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    vp = vae.init(jax.random.PRNGKey(0), x)

    lp_vars = LPIPS().init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32, 3)),
    )
    perceptual_fn = make_lpips_fn(lp_vars)

    def run(percep):
        posterior = vae.apply(vp, x, method=lambda m, a: m.encode(a))
        rec = vae.apply(
            vp, posterior.mode(), method=lambda m, z: m.decode(z)
        )
        cfg = VAELossConfig(perceptual_weight=1.0 if percep else 0.0)
        loss, metrics = generator_loss(
            rec, x, posterior, jnp.zeros((1,)), jnp.asarray(0), cfg,
            jnp.asarray(0.0),
            perceptual_fn=perceptual_fn if percep else None,
        )
        return float(loss)

    base = run(False)
    with_term = run(True)
    assert np.isfinite(with_term)
    assert with_term != base  # the perceptual term is live, not a stub


def test_vae_full_train_step_with_perceptual():
    """One VAETrainer optimizer step with an active LPIPS term runs and
    yields finite losses (the hook is wired through make_train_step)."""
    import dataclasses

    from diff_foley_tpu.models.vae import AutoencoderKL, VAEConfig
    from diff_foley_tpu.train.perceptual import LPIPS, make_lpips_fn
    from diff_foley_tpu.train.vae import VAETrainConfig, VAETrainer
    from diff_foley_tpu.train.vae_losses import VAELossConfig

    lp_vars = LPIPS().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32, 3)),
    )
    trainer = VAETrainer(
        AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)),
        VAETrainConfig(loss=VAELossConfig(perceptual_weight=1.0,
                                          disc_start=0)),
        perceptual_fn=make_lpips_fn(lp_vars),
    )
    state = trainer.init_train_state(jax.random.PRNGKey(1), (1, 32, 32, 3))
    step = jax.jit(trainer.make_train_step())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    state, logs = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["nll_loss"]))
    assert np.isfinite(float(logs["kl_loss"]))
    assert int(state.step) == 1
