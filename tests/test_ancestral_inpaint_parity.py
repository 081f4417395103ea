"""Parity for the latent sampling surfaces added in round 4, vs the
reference's OWN loops on tiny converted weights (same machinery as
test_full_stack_parity.py):

- DDIM mask/x0 inpainting (`DDIMSampler.sample(mask=..., x0=...)`,
  ddim.py:210-213 per-step known-region re-blend);
- ancestral DDPM sampling (`LatentDiffusion.p_sample_loop`,
  ddpm.py:1205-1253) including the logged intermediates;
- progressive denoising (`LatentDiffusion.progressive_denoising`,
  ddpm.py:1146-1203) with mask + per-step x0 partials.

Stochastic seams are pinned identically on both sides: the ancestral noise
is zeroed (reference: noise_like monkeypatch / temperature=0; rebuild:
temperature=0), and the inpainting forward-diffusion q_sample noise is a
fixed array injected through a q_sample override (torch) / `mask_noise`
(jax) — the deterministic forward pass the reference's own TODO at
ddim.py:211 contemplates. The loop arithmetic under test is untouched.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- make the reference package importable without lightning/torchvision ---
if "pytorch_lightning" not in sys.modules:
    fake_pl = types.ModuleType("pytorch_lightning")
    fake_pl.LightningModule = torch.nn.Module
    sys.modules["pytorch_lightning"] = fake_pl
pl_mod = sys.modules["pytorch_lightning"]
if not hasattr(pl_mod, "utilities"):
    util_mod = types.ModuleType("pytorch_lightning.utilities")
    dist_mod = types.ModuleType("pytorch_lightning.utilities.distributed")
    dist_mod.rank_zero_only = lambda fn: fn
    util_mod.distributed = dist_mod
    pl_mod.utilities = util_mod
    sys.modules["pytorch_lightning.utilities"] = util_mod
    sys.modules["pytorch_lightning.utilities.distributed"] = dist_mod
if not getattr(pl_mod, "LightningModule", None):
    pl_mod.LightningModule = torch.nn.Module
from ref_stubs import install_torchvision_stub  # noqa: E402

install_torchvision_stub()  # shared idempotent stub (models + utils)
if "omegaconf" not in sys.modules:
    fake_oc = types.ModuleType("omegaconf")
    fake_lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    fake_lc.ListConfig = ListConfig
    fake_oc.listconfig = fake_lc
    sys.modules["omegaconf"] = fake_oc
    sys.modules["omegaconf.listconfig"] = fake_lc
sys.path.insert(0, "/root/reference")

from ref_stubs import randomize_torch_model  # noqa: E402

from diff_foley_tpu.diffusion.latent_diffusion import (  # noqa: E402
    LatentDiffusion,
    LDMConfig,
)
from diff_foley_tpu.diffusion.samplers import (  # noqa: E402
    ddim_sample,
    p_sample_loop,
    progressive_denoising,
)
from diff_foley_tpu.models.unet import UNetConfig  # noqa: E402
from diff_foley_tpu.models.vae import VAEConfig  # noqa: E402
from diff_foley_tpu.utils.convert import (  # noqa: E402
    convert_cond_encoder,
    convert_unet,
)

CTX_DIM = 64
SEQ_LEN = 32
B = 2
LAT = (B, 4, 16, 64)  # torch NCHW; jax is NHWC

UNET_CFG = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
    context_dim=CTX_DIM,
)
VAE_CFG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
LDM_CFG = LDMConfig(
    unet=UNET_CFG, vae=VAE_CFG, cond_embed_dim=CTX_DIM, cond_seq_len=SEQ_LEN,
)

_FIXED_QNOISE = np.random.default_rng(7).normal(size=LAT).astype(np.float32)


def _build_ref_ldm():
    """The reference LatentDiffusion itself (ddpm.py:434), tiny geometry —
    its p_sample_loop / progressive_denoising methods are the parity
    targets, so the real class must be instantiated, not a slice."""
    from diff_foley.models.diffusion.ddpm import LatentDiffusion as RefLDM

    class DetQSample(RefLDM):
        """q_sample with the fixed noise array — the only stochastic seam
        inside the loops under test; everything else is untouched."""

        def q_sample(self, x_start, t, noise=None):
            if noise is None:
                noise = torch.from_numpy(_FIXED_QNOISE).to(x_start.dtype)
            return super().q_sample(x_start, t, noise=noise)

    torch.manual_seed(0)
    ldm = DetQSample(
        first_stage_config=dict(
            target="diff_foley.models.autoencoder.AutoencoderKL",
            params=dict(
                ddconfig=dict(
                    double_z=True, z_channels=4, resolution=64, in_channels=3,
                    out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0,
                ),
                lossconfig={"target": "torch.nn.Identity"}, embed_dim=4,
            ),
        ),
        cond_stage_config=dict(
            target=(
                "diff_foley.modules.cond_stage.video_feat_encoder."
                "Video_Feat_Encoder_Posembed"
            ),
            params=dict(origin_dim=512, embed_dim=CTX_DIM, seq_len=SEQ_LEN),
        ),
        unet_config=dict(
            target=(
                "diff_foley.modules.diffusionmodules.openai_unetmodel.UNetModel"
            ),
            params=dict(
                image_size=32, in_channels=4, out_channels=4,
                model_channels=32, attention_resolutions=[2],
                num_res_blocks=1, channel_mult=[1, 2], num_heads=4,
                use_spatial_transformer=True, transformer_depth=1,
                context_dim=CTX_DIM, use_checkpoint=False, legacy=False,
            ),
        ),
        conditioning_key="crossattn",
        cond_stage_trainable=True,
        use_ema=False,
        timesteps=1000,
        linear_start=0.00085,
        linear_end=0.0120,
        scale_factor=0.18215,
        first_stage_key="spec",
        cond_stage_key="feat",
        image_size=32,
        channels=4,
        monitor=None,
    ).eval()
    # Lightning provides .device; the nn.Module stub doesn't
    ldm.device = torch.device("cpu")
    randomize_torch_model(ldm.model.diffusion_model, seed=1)
    return ldm


@pytest.fixture(scope="module")
def models():
    ref = _build_ref_ldm()
    jldm = LatentDiffusion(LDM_CFG)
    params = {
        "unet": jax.tree.map(
            jnp.asarray,
            convert_unet(ref.model.diffusion_model.state_dict(), UNET_CFG),
        ),
        "cond": jax.tree.map(
            jnp.asarray, convert_cond_encoder(ref.cond_stage_model.state_dict())
        ),
    }
    rng = np.random.default_rng(3)
    video_feat = rng.normal(size=(B, SEQ_LEN, 512)).astype(np.float32)
    x_T = rng.normal(size=LAT).astype(np.float32)
    x0 = rng.normal(size=LAT).astype(np.float32)  # "known" latent canvas
    mask = np.zeros((B, 1, 16, 64), np.float32)
    mask[:, :, :, :24] = 1.0  # left 3/8 known, right generated
    with torch.no_grad():
        cond_t = ref.cond_stage_model(torch.from_numpy(video_feat))
    return dict(
        ref=ref, jldm=jldm, params=params, video_feat=video_feat,
        x_T=x_T, x0=x0, mask=mask, cond_t=cond_t,
    )


def _nhwc(a):
    return jnp.asarray(np.asarray(a).transpose(0, 2, 3, 1))


def _plain_eps_fn(m):
    """Unguided apply_model — reference p_sample_loop has no CFG path."""
    ctx = m["jldm"].get_learned_conditioning(
        m["params"], jnp.asarray(m["video_feat"])
    )
    return lambda x, t, s: m["jldm"].apply_model(m["params"], x, t, ctx)


def test_ddim_inpaint_parity(models):
    """Per-step mask/x0 re-blend inside the DDIM loop (ddim.py:210-213)."""
    from diff_foley.models.diffusion.ddim import DDIMSampler

    m = models
    ref = m["ref"]

    class CPUSampler(DDIMSampler):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    sampler = CPUSampler(ref)
    with torch.no_grad():
        z_ref, _ = sampler.sample(
            25, B, LAT[1:], conditioning=m["cond_t"],
            x_T=torch.from_numpy(m["x_T"]), eta=0.0, verbose=False,
            mask=torch.from_numpy(m["mask"]), x0=torch.from_numpy(m["x0"]),
            unconditional_guidance_scale=4.5,
            unconditional_conditioning=torch.zeros_like(m["cond_t"]),
        )

    from diff_foley_tpu.diffusion.guidance import (
        GuidanceSpec, make_guided_eps_fn,
    )

    ctx = m["jldm"].get_learned_conditioning(
        m["params"], jnp.asarray(m["video_feat"])
    )
    eps_fn = make_guided_eps_fn(
        lambda x, t, c: m["jldm"].apply_model(m["params"], x, t, c),
        ctx, jnp.zeros_like(ctx), GuidanceSpec(cfg_scale=4.5),
    )
    steps = 25
    mask_noise = jnp.asarray(
        np.repeat(_FIXED_QNOISE.transpose(0, 2, 3, 1)[None], steps, axis=0)
    )
    z = ddim_sample(
        eps_fn, m["jldm"].schedule, _nhwc(m["x_T"]), jax.random.PRNGKey(0),
        steps=steps, eta=0.0,
        mask=_nhwc(m["mask"]), x0=_nhwc(m["x0"]), mask_noise=mask_noise,
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref.numpy(),
        rtol=1e-3, atol=1e-3,
    )
    # non-vacuous: the blend must actually have constrained the known region
    # (a sampler ignoring mask/x0 would differ there)
    z_free = ddim_sample(
        eps_fn, m["jldm"].schedule, _nhwc(m["x_T"]), jax.random.PRNGKey(0),
        steps=steps, eta=0.0,
    )
    diff_known = np.abs(np.asarray(z - z_free))[:, :, :24, :].mean()
    assert diff_known > 1e-2, "mask had no effect on the known region"


def test_p_sample_loop_parity(models, monkeypatch):
    """Ancestral chain + intermediates vs LatentDiffusion.p_sample_loop
    (ddpm.py:1205-1253), noise zeroed on both sides (temperature=0 ==
    noise_like -> zeros: the base loop doesn't plumb temperature)."""
    import diff_foley.models.diffusion.ddpm as ref_ddpm

    m = models
    monkeypatch.setattr(
        ref_ddpm, "noise_like",
        lambda shape, device, repeat=False: torch.zeros(shape, device=device),
    )
    T, LOG = 120, 50
    with torch.no_grad():
        z_ref, inter_ref = m["ref"].p_sample_loop(
            m["cond_t"], LAT, return_intermediates=True,
            x_T=torch.from_numpy(m["x_T"]), verbose=False,
            timesteps=T, log_every_t=LOG,
        )

    z, inter = p_sample_loop(
        _plain_eps_fn(m), m["jldm"].schedule, _nhwc(m["x_T"]),
        jax.random.PRNGKey(0), timesteps=T, log_every_t=LOG,
        temperature=0.0, return_intermediates=True,
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref.numpy(),
        rtol=1e-3, atol=1e-3,
    )
    # reference list: [x_T, x@119, x@100, x@50, x@0]
    assert len(inter_ref) == inter.shape[0] == 5
    for k in range(5):
        np.testing.assert_allclose(
            np.asarray(inter[k]).transpose(0, 3, 1, 2),
            inter_ref[k].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"intermediate {k}",
        )


def test_progressive_denoising_parity(models):
    """progressive_denoising (ddpm.py:1146-1203): x0-partial intermediates +
    post-step mask blend, temperature=0.0 (plumbed by the reference here)."""
    m = models
    T, LOG = 80, 40
    with torch.no_grad():
        z_ref, partials_ref = m["ref"].progressive_denoising(
            m["cond_t"], list(LAT[1:]), verbose=False,
            x_T=torch.from_numpy(m["x_T"]), temperature=0.0,
            mask=torch.from_numpy(m["mask"]), x0=torch.from_numpy(m["x0"]),
            start_T=T, log_every_t=LOG, batch_size=B,
        )

    mask_noise = jnp.asarray(
        np.repeat(_FIXED_QNOISE.transpose(0, 2, 3, 1)[None], T, axis=0)
    )
    z, partials = progressive_denoising(
        _plain_eps_fn(m), m["jldm"].schedule, _nhwc(m["x_T"]),
        jax.random.PRNGKey(0), start_T=T, log_every_t=LOG, temperature=0.0,
        mask=_nhwc(m["mask"]), x0=_nhwc(m["x0"]), mask_noise=mask_noise,
    )
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 3, 1, 2), z_ref.numpy(),
        rtol=1e-3, atol=1e-3,
    )
    # logged at t=79 (first), 40, 0 — NOT seeded with x_T (ddpm.py:1163)
    assert len(partials_ref) == partials.shape[0] == 3
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(partials[k]).transpose(0, 3, 1, 2),
            partials_ref[k].numpy(), rtol=1e-3, atol=1e-3,
            err_msg=f"x0 partial {k}",
        )
