"""Conditioning modes, img2img DDIM, bias loss parity, model surgery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.diffusion.samplers import ddim_decode, ddim_stochastic_encode
from diff_foley_tpu.diffusion.schedule import DiffusionSchedule
from diff_foley_tpu.models.unet import UNetConfig, UNetModel
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.train.losses import (
    intra_contrast_temporal_mean_loss,
    temporal_semantic_bias_loss,
)
from diff_foley_tpu.utils.convert import (
    inflate_resnet50_to_slowonly,
    merge_params,
)

SCHED = DiffusionSchedule.create(1000, linear_start=0.00085, linear_end=0.0120)


def test_conditioning_modes():
    base = dict(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=(2,), num_heads=4, context_dim=24)
    vae = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    x = jnp.zeros((2, 16, 32, 4))
    t = jnp.zeros((2,))

    # concat: UNet input channels double
    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(in_channels=8, **base), vae=vae,
        cond_embed_dim=24, conditioning_key="concat",
    ))
    unet = ldm.unet
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 8)), t[:1], None)
    out = ldm.apply_model({"unet": params}, x, t, c_concat=jnp.zeros((2, 16, 32, 4)))
    assert out.shape == (2, 16, 32, 4)

    # adm: class-conditional
    cfg = UNetConfig(num_classes=10, **base)
    unet = UNetModel(cfg)
    params = unet.init(
        jax.random.PRNGKey(1), x[:1], t[:1], None, True, jnp.zeros((1,), jnp.int32)
    )
    out = unet.apply(params, x, t, None, True, y=jnp.array([3, 7]))
    assert out.shape == (2, 16, 32, 4)


def test_ddim_img2img_roundtrip():
    # point-mass optimal eps → decode recovers the point regardless of start
    c = -0.4
    ac = SCHED.alphas_cumprod

    def eps_fn(x, t_model, s_t):
        t_idx = jnp.clip(t_model.astype(jnp.int32), 0, 999)
        a = ac[t_idx].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * c) / jnp.sqrt(1.0 - a)

    x0 = jnp.full((2, 8, 8, 1), c)
    t_index = jnp.array([20, 20])
    z = ddim_stochastic_encode(SCHED, x0, t_index, jax.random.PRNGKey(0), steps=25)
    assert float(jnp.abs(z - x0).max()) > 0.3  # actually noised
    dec = ddim_decode(eps_fn, SCHED, z, t_start=20, steps=25)
    assert float(jnp.abs(dec - c).max()) < 0.15


def test_bias_loss_matches_torch_reference_math():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    b, t, d = 4, 8, 16
    vt = rng.normal(size=(b, t, d)).astype(np.float32)
    st = rng.normal(size=(b, t, d)).astype(np.float32)
    vm = rng.normal(size=(b, d)).astype(np.float32)
    sm = rng.normal(size=(b, d)).astype(np.float32)
    scale = 5.0
    # two late-video samples (video_start != 0), two early
    start = np.array([[2, 0], [0, 0], [3, 0], [0, 0]], np.int64)
    end = start + np.array([[5, 5], [7, 7], [4, 4], [6, 6]], np.int64)

    out = temporal_semantic_bias_loss(
        jnp.asarray(vt), jnp.asarray(vm), jnp.asarray(st), jnp.asarray(sm),
        jnp.asarray(scale), jnp.asarray(start), jnp.asarray(end),
        temporal_mix_weight=0.5,
    )

    # torch replica of the reference target/mask construction (loss.py:398-445)
    lv = scale * torch.from_numpy(vt) @ torch.from_numpy(st).permute(0, 2, 1)
    ls = scale * torch.from_numpy(st) @ torch.from_numpy(vt).permute(0, 2, 1)
    truncate_len = (end - start)[:, 0] + 1
    tv, mv, ts_, ms = [], [], [], []
    for i in range(b):
        zp = t - int(truncate_len[i])
        if start[i][0] != 0:
            tv.extend([torch.zeros(zp), torch.arange(t - zp)])
            mv.extend([torch.zeros(zp), torch.ones(t - zp)])
            ts_.extend([torch.arange(t - zp) + zp, torch.zeros(zp)])
            ms.extend([torch.ones(t - zp), torch.zeros(zp)])
        else:
            tv.extend([torch.arange(t - zp) + zp, torch.zeros(zp)])
            mv.extend([torch.ones(t - zp), torch.zeros(zp)])
            ts_.extend([torch.zeros(zp), torch.arange(t - zp)])
            ms.extend([torch.zeros(zp), torch.ones(t - zp)])
    tv = torch.cat(tv).long().reshape(b, t)
    mv = torch.cat(mv).reshape(b, t)
    ts_ = torch.cat(ts_).long().reshape(b, t)
    ms = torch.cat(ms).reshape(b, t)
    l_v = F.cross_entropy(lv.permute(0, 2, 1), tv, reduction="none")
    ref_v = ((l_v * mv).sum(1) / mv.sum(1)).mean()
    l_s = F.cross_entropy(ls.permute(0, 2, 1), ts_, reduction="none")
    ref_s = ((l_s * ms).sum(1) / ms.sum(1)).mean()
    ref_temporal = float((ref_v + ref_s) / 2)

    np.testing.assert_allclose(
        float(out["temporal_contrast_loss"]), ref_temporal, rtol=1e-5
    )


def test_intra_temporal_mean_loss_runs():
    rng = np.random.default_rng(1)
    vmax = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    vmean = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    out = intra_contrast_temporal_mean_loss(
        vmax, vmean, vmax, vmean, jnp.asarray(10.0), clip_num=3
    )
    assert np.isfinite(float(out["total_loss"]))


def test_merge_params_strict_false():
    init = {"a": {"w": np.zeros((2, 2)), "b": np.zeros(3)}, "c": np.ones(4)}
    loaded = {"a": {"w": np.full((2, 2), 5.0), "extra": np.ones(1)},
              "c": np.zeros(7)}  # wrong shape
    merged, missing, unexpected = merge_params(init, loaded)
    np.testing.assert_array_equal(merged["a"]["w"], 5.0)
    np.testing.assert_array_equal(merged["c"], 1.0)  # shape mismatch → init
    assert any("a/b" in m for m in missing)
    assert any("c" in m for m in missing)
    assert any("extra" in u for u in unexpected)


def _fake_resnet50_sd(rng):
    """torchvision-resnet50-shaped random state dict (no torchvision here)."""
    torch = pytest.importorskip("torch")
    sd = {}

    def bn(prefix, c):
        # bounded values: 50 layers of unconstrained random BN explode
        sd[f"{prefix}.weight"] = torch.rand(c) * 0.2 + 0.9
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.05
        sd[f"{prefix}.running_var"] = torch.rand(c) * 0.2 + 0.9

    def conv(shape):
        fan_in = shape[1] * shape[2] * shape[3]
        return torch.randn(*shape) / np.sqrt(fan_in)

    sd["conv1.weight"] = conv((64, 3, 7, 7))
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    in_c = 64
    for s, nb in enumerate(blocks, start=1):
        planes = 64 * 2 ** (s - 1)
        for b in range(nb):
            p = f"layer{s}.{b}"
            sd[f"{p}.conv1.weight"] = conv((planes, in_c if b == 0 else planes * 4, 1, 1))
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = conv((planes, planes, 3, 3))
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = conv((planes * 4, planes, 1, 1))
            bn(f"{p}.bn3", planes * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = conv((planes * 4, in_c, 1, 1))
                bn(f"{p}.downsample.1", planes * 4)
        in_c = planes * 4
    return sd


def test_resnet50_inflation_loads_and_is_temporally_uniform():
    from diff_foley_tpu.models.cavp.slowonly import ResNet3dSlowOnly

    sd = _fake_resnet50_sd(0)
    variables = jax.tree.map(jnp.asarray, inflate_resnet50_to_slowonly(sd))
    model = ResNet3dSlowOnly()
    # init to verify tree structure compatibility
    ref_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)))
    merged, missing, unexpected = merge_params(
        {"params": ref_vars["params"], "batch_stats": ref_vars["batch_stats"]},
        variables,
    )
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]

    # constant-in-time input → per-frame outputs identical (inflation /t)
    frame = np.random.default_rng(0).normal(size=(1, 1, 32, 32, 3))
    video = jnp.asarray(np.repeat(frame, 4, axis=1), jnp.float32)
    out = model.apply(variables, video, train=False)
    diff = float(jnp.abs(out[:, 1:-1] - out[:, 1:2]).max())
    assert diff < 2e-3, diff
