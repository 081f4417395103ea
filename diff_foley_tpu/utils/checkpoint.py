"""Checkpoint save/resume (orbax) + reference-checkpoint loading.

Replaces the reference's crash-resilience machinery (SURVEY.md §5):
per-step orbax checkpoints with retention, `resume latest` directory scan
(main_wds_intra_contrast.py:109-170), and atomic writes (orbax's tmp+rename
mirrors the reference's tmp+os.replace at :416-421).

`load_reference_ldm` converts a released torch LatentDiffusion checkpoint
(ldm_epoch240.ckpt layout) into this framework's parameter trees.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper with resume-latest semantics."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        ocp = _ocp()
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        try:
            return self.mgr.restore(
                step, args=ocp.args.StandardRestore(state_template)
            )
        except Exception:
            # tree-structure mismatch: try migrating checkpoints written
            # before the GEGLU proj -> proj_x/proj_gate split
            raw = self.mgr.restore(step)
            migrated = migrate_geglu_split(raw, state_template)
            flat_t = jax.tree_util.tree_structure(state_template)
            flat_m = jax.tree_util.tree_structure(migrated)
            if flat_t != flat_m:
                raise
            return migrated


def migrate_geglu_split(tree: Any, template: Any) -> Any:
    """Migrate pre-split GEGLU checkpoints to the proj_x/proj_gate layout.

    The GEGLU module was refactored from one Dense(2F) named ``proj`` into two
    Dense(F) modules ``proj_x``/``proj_gate`` (so each kernel column-shards
    independently under tensor parallelism — models/attention.py:68). Old
    native checkpoints hold the stacked kernel/bias; split them at F wherever
    the template expects the new pair.
    """
    if isinstance(tree, dict) and isinstance(template, dict):
        out = {}
        for k, tmpl_v in template.items():
            if (
                k in ("proj_x", "proj_gate")
                and k not in tree
                and "proj" in tree
                and isinstance(tree["proj"], dict)
            ):
                half = 0 if k == "proj_x" else 1
                out[k] = {
                    name: np.split(np.asarray(arr), 2, axis=-1)[half]
                    for name, arr in tree["proj"].items()
                }
            elif k in tree:
                out[k] = migrate_geglu_split(tree[k], tmpl_v)
            else:
                out[k] = tree.get(k)  # surfaces as a structure mismatch
        return out
    return tree


def load_reference_ldm(
    ckpt_path: str, ldm, load_vae: bool = True
) -> Tuple[Dict, Optional[Dict]]:
    """Released LatentDiffusion torch ckpt → ({unet, cond} params, vae params).

    Splits on the model.diffusion_model./first_stage_model./cond_stage_model.
    prefixes (ddpm.py:1545-1571) and converts each family.
    """
    from .convert import (
        convert_cond_encoder,
        convert_unet,
        convert_vae,
        load_torch_state_dict,
        split_ldm_state_dict,
    )
    import jax.numpy as jnp

    sd = load_torch_state_dict(ckpt_path)
    unet_sd, vae_sd, cond_sd = split_ldm_state_dict(sd)
    to_dev = lambda tree: jax.tree.map(jnp.asarray, tree)
    params = {
        "unet": to_dev(convert_unet(unet_sd, ldm.cfg.unet)),
        "cond": to_dev(convert_cond_encoder(cond_sd)),
    }
    if load_vae and not vae_sd:
        raise ValueError(
            f"{ckpt_path} contains no first_stage_model.* (VAE) keys — not "
            "a full LatentDiffusion checkpoint; pass load_vae=False if the "
            "VAE comes from elsewhere"
        )
    vae_params = to_dev(convert_vae(vae_sd, ldm.cfg.vae)) if load_vae else None
    return params, vae_params


def load_vae_checkpoint(ckpt_path: str, vae_cfg) -> Dict:
    """VAE params from EITHER a composite LDM checkpoint (first_stage_model.*
    keys) or a standalone AutoencoderKL state dict (encoder./decoder. keys) —
    what a `--vae-ckpt` flag should accept."""
    from .convert import (
        convert_vae,
        load_torch_state_dict,
        split_ldm_state_dict,
    )
    import jax.numpy as jnp

    sd = load_torch_state_dict(ckpt_path)
    _, vae_sd, _ = split_ldm_state_dict(sd)
    if not vae_sd:
        if any(k.startswith("encoder.") for k in sd):
            vae_sd = sd  # bare AutoencoderKL layout
        else:
            raise ValueError(
                f"{ckpt_path} has neither first_stage_model.* nor bare "
                "encoder.* VAE keys"
            )
    return jax.tree.map(jnp.asarray, convert_vae(vae_sd, vae_cfg))


def load_reference_cavp(ckpt_path: str) -> Dict:
    """Released cavp_epoch66.ckpt → CAVPModel variables."""
    from .convert import convert_cavp, load_torch_state_dict
    import jax.numpy as jnp

    sd = load_torch_state_dict(ckpt_path)
    return jax.tree.map(jnp.asarray, convert_cavp(sd))


def load_reference_classifier(ckpt_path: str) -> Dict:
    """Released double_guidance_classifier.ckpt → trainer params.

    Layout (alignment_classifier.py): 'model.' = backbone, 'cond_model.' =
    Posembed encoder (the VAE lives under 'first_stage_model.').
    """
    from .convert import (
        convert_classifier_backbone,
        convert_cond_encoder,
        convert_vae,
        load_torch_state_dict,
    )
    import jax.numpy as jnp
    from ..models.unet import CLASSIFIER_BACKBONE
    from ..models.vae import SD_VAE

    sd = load_torch_state_dict(ckpt_path)
    backbone_sd = {k[len("model.") :]: v for k, v in sd.items() if k.startswith("model.")}
    cond_sd = {
        k[len("cond_model.") :]: v for k, v in sd.items()
        if k.startswith("cond_model.")
    }
    vae_sd = {
        k[len("first_stage_model.") :]: v
        for k, v in sd.items()
        if k.startswith("first_stage_model.")
    }
    out = {
        "backbone": convert_classifier_backbone(backbone_sd, CLASSIFIER_BACKBONE),
        "cond": convert_cond_encoder(cond_sd),
    }
    if vae_sd:
        out["vae"] = convert_vae(vae_sd, SD_VAE)
    return jax.tree.map(lambda x: jax.numpy.asarray(x), out)


# --------------------------------------------------------------------------
# native training-logdir loaders: the framework's OWN checkpoints are
# first-class for inference. Each training CLI writes config.json
# (config.save_run_config) next to its orbax ckpt/ directory; these loaders
# rebuild the exact model from that metadata and restore inference-ready
# parameters (no optimizer state leaves the function). Reference analogue:
# demo_util.py loads the released torch ckpts — this is the same door for
# models trained here.
# --------------------------------------------------------------------------

def is_native_logdir(path) -> bool:
    """True for a diff_foley_tpu training logdir (config.json + orbax
    ckpts) — the single predicate every CLI uses to decide whether a
    `--*-ckpt` argument is a native logdir or a torch checkpoint file."""
    return bool(path) and os.path.isdir(path) and os.path.exists(
        os.path.join(path, "config.json")
    )


def _restore_from(logdir: str, subdir: str, template: Any) -> Any:
    mgr = CheckpointManager(os.path.join(logdir, subdir))
    if mgr.latest_step() is None:
        raise FileNotFoundError(f"no checkpoints under {logdir}/{subdir}")
    return mgr.restore(template)


def _has_ckpt(logdir: str, subdir: str) -> bool:
    """A checkpoint actually exists (an empty directory — e.g. a save that
    died mid-write — counts as absent, not as an error)."""
    d = os.path.join(logdir, subdir)
    return os.path.isdir(d) and CheckpointManager(d).latest_step() is not None


def load_native_cavp(logdir: str):
    """Stage-1 logdir → (CAVPModel, inference variables).

    Variables carry the trained params plus BatchNorm running stats
    (the towers' eval-mode statistics, CAVPTrainState.batch_stats).
    """
    from ..config import config_from_dict, load_run_config
    from ..models.cavp.cavp import CAVPConfig, CAVPModel
    from ..train.stage1_cavp import Stage1TrainConfig, init_train_state

    meta = load_run_config(logdir, "stage1_cavp")
    model = CAVPModel(config_from_dict(CAVPConfig, meta["model"]))
    tcfg = config_from_dict(Stage1TrainConfig, meta["train"])
    template = jax.eval_shape(
        lambda k: init_train_state(
            model, k, tcfg,
            video_shape=tuple(meta["init_video_shape"]),
            spec_shape=tuple(meta["init_spec_shape"]),
        ),
        jax.random.PRNGKey(0),
    )
    state = _restore_from(logdir, "ckpt", template)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def native_cavp_ingest_size(logdir: str, default: int = 224) -> int:
    """Frame size the CAVP was trained at (from the recorded init video
    shape) — the ingest resize every consumer should default to. Feeding a
    tower frames at a geometry it never saw runs without error and silently
    degrades features."""
    from ..config import load_run_config

    meta = load_run_config(logdir, "stage1_cavp")
    shape = meta.get("init_video_shape")
    return int(shape[2]) if shape else default


def load_native_ldm(logdir: str, prefer_ema: bool = True):
    """Stage-2 logdir → (LatentDiffusion, {unet, cond} params, vae params).

    `prefer_ema` returns the EMA shadow when the run trained one — the
    reference samples with EMA weights (LitEma swap, ddpm.py:220-232).
    The frozen first-stage VAE the run used is restored from `{logdir}/vae`
    (written once by cli.train_stage2), so the logdir alone is sufficient
    to generate.
    """
    from ..config import config_from_dict, load_run_config
    from ..diffusion.latent_diffusion import LatentDiffusion, LDMConfig
    from ..train.stage2_ldm import Stage2TrainConfig, init_train_state

    meta = load_run_config(logdir, "stage2_ldm")
    ldm = LatentDiffusion(config_from_dict(LDMConfig, meta["model"]))
    tcfg = config_from_dict(Stage2TrainConfig, meta["train"])
    template = jax.eval_shape(
        lambda k: init_train_state(ldm, k, tcfg), jax.random.PRNGKey(0)
    )
    state = _restore_from(logdir, "ckpt", template)
    params = (
        state.ema.params if (prefer_ema and state.ema is not None)
        else state.params
    )
    vae_params = None
    if _has_ckpt(logdir, "vae"):
        vae_template = jax.eval_shape(ldm.init_vae_params, jax.random.PRNGKey(0))
        vae_params = _restore_from(logdir, "vae", vae_template)
    return ldm, params, vae_params


def load_native_classifier(logdir: str):
    """Classifier logdir → (ClassifierTrainer, trained params, vae params).

    `trainer.apply(params, z_noisy, t, video_feat)` is the align-acc /
    eval surface; `(trainer.backbone.apply, params["backbone"])` is the
    double-guidance pair the pipeline consumes (guidance feeds the backbone
    raw CAVP features — the reference quirk, see latent_diffusion.sample).
    The returned vae params are the frozen encoder this run scored latents
    against (`{logdir}/vae`, written by cli.train_classifier) — align-acc
    must encode with the same one; None for logdirs predating persistence.
    """
    from ..config import config_from_dict, load_run_config
    from ..models.unet import UNetConfig
    from ..models.vae import AutoencoderKL, VAEConfig
    from ..train.classifier import ClassifierTrainConfig, ClassifierTrainer

    meta = load_run_config(logdir, "classifier")
    trainer = ClassifierTrainer(
        backbone_cfg=config_from_dict(UNetConfig, meta["backbone"]),
        vae=AutoencoderKL(config_from_dict(VAEConfig, meta["vae"])),
        cfg=config_from_dict(ClassifierTrainConfig, meta["train"]),
        cond_seq_len=meta["cond_seq_len"],
    )
    template = jax.eval_shape(trainer.init_train_state, jax.random.PRNGKey(0))
    state = _restore_from(logdir, "ckpt", template)
    vae_params = None
    if _has_ckpt(logdir, "vae"):
        import jax.numpy as jnp

        vae_template = jax.eval_shape(
            lambda k: trainer.vae.init(k, jnp.zeros((1, 128, 512, 3))),
            jax.random.PRNGKey(0),
        )
        vae_params = _restore_from(logdir, "vae", vae_template)
    return trainer, state.params, vae_params


def load_native_vae(logdir: str, expect_cfg=None):
    """First-stage VAE training logdir (cli.train_vae) → (AutoencoderKL,
    variables) ready for encode/decode_first_stage. `expect_cfg` (a
    VAEConfig) asserts the trained geometry matches the model that will
    consume it — the useful error beats a tree mismatch deep in restore.
    """
    from ..config import config_from_dict, load_run_config
    from ..models.vae import AutoencoderKL, VAEConfig
    from ..train.vae import VAETrainConfig, VAETrainer

    meta = load_run_config(logdir, "vae")
    vae_cfg = config_from_dict(VAEConfig, meta["model"])
    if expect_cfg is not None and vae_cfg != expect_cfg:
        raise ValueError(
            f"{logdir} trained VAEConfig {vae_cfg}, but the consumer "
            f"expects {expect_cfg} — latent geometries must match"
        )
    trainer = VAETrainer(
        AutoencoderKL(vae_cfg),
        cfg=config_from_dict(VAETrainConfig, meta["train"]),
    )
    template = jax.eval_shape(
        lambda k: trainer.init_train_state(
            k, sample_shape=tuple(meta["sample_shape"])
        ),
        jax.random.PRNGKey(0),
    )
    state = _restore_from(logdir, "ckpt", template)
    return trainer.vae, state.params


def load_native_sound_vae(logdir: str):
    """Waveform-VAE logdir (cli.train_sound_vae) → (SoundAutoencoderKL,
    variables) for encode/decode on 16 kHz waveforms."""
    from ..config import config_from_dict, load_run_config
    from ..models.sound_vae import SoundVAEConfig
    from ..train.sound_gan import AudioGANConfig, SoundVAETrainer

    meta = load_run_config(logdir, "sound_vae")
    trainer = SoundVAETrainer(
        config_from_dict(AudioGANConfig, meta["train"]),
        config_from_dict(SoundVAEConfig, meta["model"]),
    )
    template = jax.eval_shape(
        lambda k: trainer.init_train_state(k, n_samples=meta["window"]),
        jax.random.PRNGKey(0),
    )
    state = _restore_from(logdir, "ckpt", template)
    return trainer.vae, state.params
