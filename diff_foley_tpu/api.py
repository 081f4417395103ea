"""High-level user API: the notebook/demo surface as one object.

Mirrors the reference demo flow (inference/demo_util.py +
diff_foley_inference.ipynb): load the three checkpoints, extract CAVP
features from a video, generate foley audio.

    from diff_foley_tpu.api import DiffFoley
    df = DiffFoley.from_checkpoints(cavp="cavp_epoch66.ckpt",
                                    ldm="ldm_epoch240.ckpt",
                                    classifier="double_guidance_classifier.ckpt")
    out = df.generate_for_video("video.mp4", seed=21)
    # out["wav"]: (sample_num, n_samples) float32 @16 kHz
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from .models.cavp import CAVPModel
from .models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
from .pipeline import DiffFoleyPipeline, GenerationConfig
from .utils.precision import cast_floating
from .video.ingest import extract_cavp_features


class DiffFoley:
    def __init__(self, ldm: LatentDiffusion, params, vae_params,
                 cavp: CAVPModel, cavp_variables, classifier=None,
                 bf16: bool = True, frame_size: int = 224):
        self.frame_size = frame_size
        if bf16:
            ldm = LatentDiffusion(dataclasses.replace(
                ldm.cfg, unet=dataclasses.replace(ldm.cfg.unet, dtype="bfloat16")
            ))
            params = {"unet": cast_floating(params["unet"]),
                      "cond": params["cond"]}
        self.ldm = ldm
        self.cavp = cavp
        self.cavp_variables = cavp_variables
        self.pipe = DiffFoleyPipeline(
            ldm, params, vae_params, classifier,
            vae_dtype="bfloat16" if bf16 else None,
        )
        self._encode = jax.jit(
            lambda v, x: cavp.apply(
                v, jnp.asarray(x),
                method=lambda m, a: m.encode_video(a, normalize=True, pool=False),
            )
        )

    @classmethod
    def from_checkpoints(
        cls, cavp: str, ldm: str, classifier: Optional[str] = None,
        bf16: bool = True,
    ) -> "DiffFoley":
        from .utils.checkpoint import (
            load_reference_cavp,
            load_reference_classifier,
            load_reference_ldm,
        )

        ldm_model = LatentDiffusion(LDMConfig())
        params, vae_params = load_reference_ldm(ldm, ldm_model)
        cavp_model = CAVPModel()
        cavp_vars = load_reference_cavp(cavp)
        clf = None
        if classifier:
            cp = load_reference_classifier(classifier)
            backbone = ClassifierBackbone(CLASSIFIER_BACKBONE)
            # guidance context is the raw CAVP features (reference quirk,
            # alignment_classifier.py:285-287) — the ckpt's cond_model params
            # are only needed for align-acc, not here
            clf = (backbone.apply, cp["backbone"])
        return cls(ldm_model, params, vae_params, cavp_model, cavp_vars, clf,
                   bf16=bf16)

    @classmethod
    def from_native_checkpoints(
        cls, cavp: str, ldm: str, classifier: Optional[str] = None,
        vae_ckpt: Optional[str] = None, bf16: bool = True,
        frame_size: Optional[int] = None,
        classifier_context: str = "raw",
    ) -> "DiffFoley":
        """Assemble the inference API from this framework's OWN training
        logdirs (cli.train_cavp / cli.train_stage2 / cli.train_classifier
        outputs) — the native twin of `from_checkpoints`. The LDM uses its
        EMA weights when the run trained them; the first-stage VAE comes
        from the stage-2 logdir, or `vae_ckpt` (a cli.train_vae logdir or a
        torch checkpoint) overrides it. `frame_size` defaults to the ingest
        geometry the CAVP was trained at (recorded in its config.json).

        `classifier_context` picks what the guidance classifier sees as
        cross-attention context: "raw" feeds the raw 512-d CAVP features —
        the reference's shipped behaviour (alignment_classifier.py:285-287
        forward vs :234-235 training, a train/inference mismatch the
        reference carries); "encoded" routes them through the classifier's
        own trained cond encoder — the distribution it actually trained on
        (measured on the toy quality gate: raw guidance DEGRADES align-acc
        below unguided, encoded guidance lifts it well above —
        QUALITY_r04.json trained_on_chip)."""
        from .utils.checkpoint import (
            is_native_logdir,
            load_native_cavp,
            load_native_classifier,
            load_native_ldm,
            load_native_vae,
            load_vae_checkpoint,
            native_cavp_ingest_size,
        )

        ldm_model, params, vae_params = load_native_ldm(ldm)
        if vae_ckpt is not None:
            if is_native_logdir(vae_ckpt):
                _, vae_params = load_native_vae(
                    vae_ckpt, expect_cfg=ldm_model.cfg.vae
                )
            else:
                vae_params = load_vae_checkpoint(vae_ckpt, ldm_model.cfg.vae)
        if vae_params is None:
            raise FileNotFoundError(
                f"{ldm}/vae holds no first-stage VAE weights (logdir predates "
                "VAE persistence?) — pass vae_ckpt="
            )
        cavp_model, cavp_vars = load_native_cavp(cavp)
        if frame_size is None:
            frame_size = native_cavp_ingest_size(cavp)
        clf = None
        if classifier:
            trainer, cparams, _ = load_native_classifier(classifier)
            if classifier_context == "encoded":
                def clf_apply(cp, x, t, feat, return_logits=False,
                              _trainer=trainer):
                    ctx = _trainer.cond_encoder.apply(cp["cond"], feat)
                    return _trainer.backbone.apply(
                        cp["backbone"], x, t, ctx, return_logits=return_logits)

                clf = (clf_apply, cparams)
            elif classifier_context == "raw":
                clf = (trainer.backbone.apply, cparams["backbone"])
            else:
                raise ValueError(
                    f"classifier_context must be 'raw' or 'encoded', "
                    f"got {classifier_context!r}")
        return cls(ldm_model, params, vae_params, cavp_model, cavp_vars, clf,
                   bf16=bf16, frame_size=frame_size)

    def extract_features(self, video_path: str, start_second: float = 0.0,
                         truncate_second: Optional[float] = None) -> np.ndarray:
        return extract_cavp_features(
            video_path, self._encode, self.cavp_variables,
            start_second=start_second, truncate_second=truncate_second,
            size=self.frame_size,
        )

    def generate_for_video(
        self, video_path: str, seed: int = 21,
        gen: GenerationConfig = GenerationConfig(),
        start_second: float = 0.0, truncate_second: Optional[float] = 8.2,
    ):
        feats = self.extract_features(video_path, start_second, truncate_second)
        return self.pipe.generate(feats, jax.random.PRNGKey(seed), gen)

    def generate_from_features(self, feats: np.ndarray, seed: int = 21,
                               gen: GenerationConfig = GenerationConfig()):
        return self.pipe.generate(feats, jax.random.PRNGKey(seed), gen)

    def continue_audio(
        self, feats: np.ndarray, known_spec: np.ndarray, known_seconds: float,
        seed: int = 21,
        gen: GenerationConfig = GenerationConfig(sampler="ddim"),
    ):
        """Keep the first `known_seconds` of `known_spec` (a mel image in
        [0, 1], e.g. a prior generate() output sample) and regenerate the
        rest against the video features — latent-space audio continuation
        via the DDIM mask/x0 path (see DiffFoleyPipeline.inpaint)."""
        from .pipeline import continuation_mask

        known_spec = np.asarray(known_spec, np.float32)
        frames = int(round(known_seconds * self.pipe.melspec.sr
                           / self.pipe.melspec.hop_length))
        mask = continuation_mask(known_spec.shape[1], frames)
        return self.pipe.inpaint(
            feats, known_spec, mask, jax.random.PRNGKey(seed), gen)
