"""Typed config tree + reference-YAML compatibility layer.

The reference drives all model construction through OmegaConf YAML with
`target:` dotted class paths + `params:` (instantiate_from_config,
`diff_foley/util.py:258-273`). This module keeps that on-disk shape — the
shipped configs (inference/config/*.yaml, configs/ldm_training/*.yaml) load
unchanged — but resolves targets through an explicit registry onto this
framework's typed dataclass configs instead of arbitrary import-by-string.
"""
from __future__ import annotations

import dataclasses
import json
import os
import typing
from typing import Any, Callable, Dict, Optional

import yaml

from .diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from .models.unet import UNetConfig
from .models.vae import VAEConfig

_REGISTRY: Dict[str, Callable[..., Any]] = {}


# --------------------------------------------------------------------------
# dataclass-config (de)serialisation — makes training logdirs self-describing
#
# The reference reaches the same goal by copying the launch YAML into the
# Lightning logdir (main.py writes cfg to logs/<name>/configs/); here the
# typed config tree round-trips through JSON instead, so a native inference
# loader can rebuild the exact model a checkpoint was trained with.
# --------------------------------------------------------------------------

def config_to_dict(cfg: Any) -> Dict:
    """Frozen-dataclass config → JSON-safe dict (tuples become lists)."""
    return dataclasses.asdict(cfg)


def config_from_dict(cls, d: Dict):
    """Inverse of config_to_dict: rebuild `cls` from a JSON dict, recursing
    into dataclass-typed fields and restoring tuple-typed fields (JSON has
    no tuple type)."""
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = hints.get(f.name)
        if v is None:
            kwargs[f.name] = None
            continue
        origin = typing.get_origin(t)
        if origin is typing.Union:  # Optional[T] → T
            args = [a for a in typing.get_args(t) if a is not type(None)]
            if len(args) == 1:
                t = args[0]
                origin = typing.get_origin(t)
        if dataclasses.is_dataclass(t) and isinstance(v, dict):
            v = config_from_dict(t, v)
        elif isinstance(v, list) and not (t is list or origin is list):
            # JSON has no tuple type; config sequences (tuple / Sequence
            # annotations) are tuples in every dataclass here
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[f.name] = v
    return cls(**kwargs)


RUN_CONFIG = "config.json"


def save_run_config(logdir: str, kind: str, **sections: Any) -> str:
    """Write `{logdir}/config.json` describing a training run: `kind` names
    the trainer family; each section is a config dataclass (serialised) or a
    plain JSON value. Training CLIs call this so their logdirs are loadable
    by the native inference loaders (utils/checkpoint.py::load_native_*)."""
    payload: Dict[str, Any] = {"kind": kind}
    for name, val in sections.items():
        payload[name] = (
            config_to_dict(val) if dataclasses.is_dataclass(val) else val
        )
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, RUN_CONFIG)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path


def load_run_config(logdir: str, expect_kind: Optional[str] = None) -> Dict:
    path = os.path.join(logdir, RUN_CONFIG)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — this logdir predates run-config persistence "
            "or is not a diff_foley_tpu training logdir; rebuild the model "
            "explicitly and restore through CheckpointManager instead"
        )
    with open(path) as f:
        meta = json.load(f)
    if expect_kind is not None and meta.get("kind") != expect_kind:
        raise ValueError(
            f"{path}: kind={meta.get('kind')!r}, expected {expect_kind!r}"
        )
    return meta


def register(*targets: str):
    def deco(fn):
        for t in targets:
            _REGISTRY[t] = fn
        return fn

    return deco


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def instantiate_from_config(cfg: Dict) -> Any:
    """Reference-compatible: {'target': dotted.path, 'params': {...}}."""
    if not isinstance(cfg, dict) or "target" not in cfg:
        raise KeyError(f"expected a {{target, params}} mapping, got {cfg!r}")
    target = cfg["target"]
    key = _resolve_key(target)
    if key is None:
        raise KeyError(
            f"unknown target '{target}' — register a builder in "
            "diff_foley_tpu.config"
        )
    return _REGISTRY[key](**cfg.get("params", {}))


def _resolve_key(target: str):
    if target in _REGISTRY:
        return target
    # match by trailing class name so both diff_foley.* and adm.* paths work
    cls = target.rsplit(".", 1)[-1]
    for k in _REGISTRY:
        if k.rsplit(".", 1)[-1] == cls:
            return k
    return None


# --------------------------------------------------------------------------
# builders
# --------------------------------------------------------------------------

@register("diff_foley.modules.diffusionmodules.openai_unetmodel.UNetModel")
def _build_unet_cfg(**p) -> UNetConfig:
    return UNetConfig(
        in_channels=p.get("in_channels", 4),
        out_channels=p.get("out_channels", 4),
        model_channels=p.get("model_channels", 320),
        num_res_blocks=p.get("num_res_blocks", 2),
        attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
        channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
        num_heads=p.get("num_heads", 8),
        transformer_depth=p.get("transformer_depth", 1),
        context_dim=p.get("context_dim", 768),
        dropout=p.get("dropout", 0.0),
        use_checkpoint=p.get("use_checkpoint", False),
    )


@register("diff_foley.modules.double_guidance.alignment_backbone.Classifier_Backbone")
def _build_classifier_cfg(**p) -> UNetConfig:
    return _build_unet_cfg(**{**p, "out_channels": p.get("out_channels", 1)})


@register("diff_foley.models.autoencoder.AutoencoderKL")
def _build_vae_cfg(**p) -> VAEConfig:
    dd = p.get("ddconfig", {})
    return VAEConfig(
        in_channels=dd.get("in_channels", 3),
        out_channels=dd.get("out_ch", 3),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        z_channels=dd.get("z_channels", 4),
        embed_dim=p.get("embed_dim", 4),
        double_z=dd.get("double_z", True),
        dropout=dd.get("dropout", 0.0),
    )


@register(
    "diff_foley.modules.cond_stage.video_feat_encoder.Video_Feat_Encoder_Posembed"
)
def _build_cond_cfg(**p) -> Dict:
    return {
        "origin_dim": p.get("origin_dim", 512),
        "embed_dim": p.get("embed_dim", 768),
        "seq_len": p.get("seq_len", 40),
    }


@register("diff_foley.models.diffusion.ddpm.LatentDiffusion")
def _build_ldm(**p) -> LatentDiffusion:
    unet = _build_unet_cfg(**p["unet_config"].get("params", {}))
    vae = _build_vae_cfg(**p["first_stage_config"].get("params", {}))
    cond = _build_cond_cfg(**p["cond_stage_config"].get("params", {}))
    cfg = LDMConfig(
        unet=unet,
        vae=vae,
        cond_origin_dim=cond["origin_dim"],
        cond_embed_dim=cond["embed_dim"],
        cond_seq_len=cond["seq_len"],
        timesteps=p.get("timesteps", 1000),
        linear_start=p.get("linear_start", 0.00085),
        linear_end=p.get("linear_end", 0.0120),
        scale_factor=p.get("scale_factor", 0.18215),
    )
    return LatentDiffusion(cfg)


def load_ldm_from_yaml(path: str) -> LatentDiffusion:
    """Load the reference's Stage2_LDM.yaml (or the training yaml) directly."""
    cfg = load_yaml(path)
    return instantiate_from_config(cfg["model"])
