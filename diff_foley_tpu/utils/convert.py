"""Torch checkpoint → JAX parameter-tree conversion.

Covers the four released model families (SURVEY.md §5 "Checkpoint / resume"):
LDM UNet, first-stage VAE (AutoencoderKL), conditioning encoder, and the
alignment-classifier backbone.  Layout transforms:

- Conv2d  (O, I, kh, kw) → HWIO (kh, kw, I, O)
- Linear  (O, I)         → (I, O)
- GroupNorm/LayerNorm weight → scale (unchanged)
- Embedding (N, D)       → unchanged

Key layouts follow the reference state dicts (`diff_foley/modules/
diffusionmodules/openai_unetmodel.py:443-742`, `diff_foley/models/
autoencoder.py`, `.../alignment_backbone.py:417-687`). A composite
LatentDiffusion checkpoint splits on the `model.diffusion_model.` /
`first_stage_model.` / `cond_stage_model.` prefixes (ddpm.py:1545-1571).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

Array = np.ndarray
StateDict = Mapping[str, "object"]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)


def _dense(t) -> np.ndarray:
    return _np(t).transpose(1, 0)


def _id(t) -> np.ndarray:
    return _np(t)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class _Mapper:
    def __init__(self, sd: StateDict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.tree: Dict = {}
        self.used: set = set()

    def take(self, my_path: str, torch_key: str, tf: Callable) -> None:
        key = self.prefix + torch_key
        _set(self.tree, my_path, tf(self.sd[key]))
        self.used.add(key)

    # composite helpers -------------------------------------------------
    def gn(self, my: str, torch: str) -> None:
        # flax GroupNorm32 wraps nn.GroupNorm as GroupNorm_0
        self.take(f"{my}/GroupNorm_0/scale", f"{torch}.weight", _id)
        self.take(f"{my}/GroupNorm_0/bias", f"{torch}.bias", _id)

    def gn_flat(self, my: str, torch: str) -> None:
        self.take(f"{my}/scale", f"{torch}.weight", _id)
        self.take(f"{my}/bias", f"{torch}.bias", _id)

    def conv(self, my: str, torch: str) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _conv)
        self.take(f"{my}/bias", f"{torch}.bias", _id)

    def dense(self, my: str, torch: str, bias: bool = True) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _dense)
        if bias:
            self.take(f"{my}/bias", f"{torch}.bias", _id)

    def dense_halves(self, my_first: str, my_second: str, torch: str) -> None:
        """torch Dense(2F) whose output rows stack [first; second] → two
        flax Dense(F) modules (GEGLU's TP-friendly split layout)."""
        w = _dense(self.sd[self.prefix + f"{torch}.weight"])  # (d, 2F)
        b = _id(self.sd[self.prefix + f"{torch}.bias"])
        half = w.shape[1] // 2
        _set(self.tree, f"{my_first}/kernel", w[:, :half])
        _set(self.tree, f"{my_first}/bias", b[:half])
        _set(self.tree, f"{my_second}/kernel", w[:, half:])
        _set(self.tree, f"{my_second}/bias", b[half:])
        self.used.add(self.prefix + f"{torch}.weight")
        self.used.add(self.prefix + f"{torch}.bias")

    def resblock(self, my: str, torch: str, has_skip: bool) -> None:
        self.gn(f"{my}/in_norm", f"{torch}.in_layers.0")
        self.conv(f"{my}/in_conv", f"{torch}.in_layers.2")
        self.dense(f"{my}/emb_dense", f"{torch}.emb_layers.1")
        self.gn(f"{my}/out_norm", f"{torch}.out_layers.0")
        self.conv(f"{my}/out_conv", f"{torch}.out_layers.3")
        if has_skip:
            self.conv(f"{my}/skip_conv", f"{torch}.skip_connection")

    def spatial_transformer(self, my: str, torch: str, depth: int = 1) -> None:
        self.gn_flat(f"{my}/norm", f"{torch}.norm")
        self.conv(f"{my}/proj_in", f"{torch}.proj_in")
        _token_transformer_blocks(self, my, torch, depth)
        self.conv(f"{my}/proj_out", f"{torch}.proj_out")


def _get(tree, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def _conv_inv(a):   # HWIO → OIHW
    return np.asarray(a).transpose(3, 2, 0, 1)


def _conv3d_inv(a):  # tHWIO → OItHW
    return np.asarray(a).transpose(4, 3, 0, 1, 2)


_INVERSE = {}


class _ExportMapper(_Mapper):
    """Walks the same layout maps in reverse: flax params → torch keys.

    Instantiate with the flax 'params' subtree (no {'params': ...} wrapper);
    the exported dict uses the reference torch key layout and numpy arrays.
    """

    def __init__(self, params: Dict, prefix: str = ""):
        super().__init__({}, prefix)
        self.params = params
        self.out: Dict[str, np.ndarray] = {}

    def take(self, my_path: str, torch_key: str, tf: Callable) -> None:
        inv = _INVERSE[tf]
        self.out[self.prefix + torch_key] = np.asarray(inv(_get(self.params, my_path)))
        self._n_leaves_exported += 1

    _n_leaves_exported = 0

    def dense_halves(self, my_first: str, my_second: str, torch: str) -> None:
        # inverse of _Mapper.dense_halves: concat the two flax Dense halves
        # back into the torch stacked layout
        kf = np.asarray(_get(self.params, f"{my_first}/kernel"))
        ks = np.asarray(_get(self.params, f"{my_second}/kernel"))
        bf = np.asarray(_get(self.params, f"{my_first}/bias"))
        bs = np.asarray(_get(self.params, f"{my_second}/bias"))
        self.out[self.prefix + f"{torch}.weight"] = np.concatenate(
            [kf, ks], axis=1).transpose(1, 0)
        self.out[self.prefix + f"{torch}.bias"] = np.concatenate([bf, bs])
        self._n_leaves_exported += 4

    def assert_complete(self) -> None:
        """Every param leaf must have been exported exactly once — catches a
        config that walks a smaller structure than the checkpoint has."""
        n_leaves = len(jax.tree_util.tree_leaves(self.params))
        if n_leaves != self._n_leaves_exported:
            raise ValueError(
                f"export incomplete: {self._n_leaves_exported} exported "
                f"leaves for {n_leaves} parameter leaves "
                "(config/layout mismatch?)"
            )


def convert_unet(sd: StateDict, cfg, prefix: str = "", mapper=None) -> Dict:
    """Reference UNetModel state dict → flax params for models.unet.UNetModel."""
    m = mapper or _Mapper(sd, prefix)
    m.dense("time_embed/dense0", "time_embed.0")
    m.dense("time_embed/dense1", "time_embed.2")
    m.conv("in_conv", "input_blocks.0.0")

    n = 1
    ds = 1
    ch = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = mult * cfg.model_channels
        for i in range(cfg.num_res_blocks):
            my = f"down_{level}_{i}_res"
            m.resblock(my, f"input_blocks.{n}.0", has_skip=ch != out_ch)
            ch = out_ch
            if ds in cfg.attention_resolutions:
                m.spatial_transformer(
                    f"down_{level}_{i}_attn", f"input_blocks.{n}.1",
                    cfg.transformer_depth,
                )
            n += 1
        if level != len(cfg.channel_mult) - 1:
            m.conv(f"down_{level}_ds/conv", f"input_blocks.{n}.0.op")
            n += 1
            ds *= 2

    m.resblock("mid_res1", "middle_block.0", has_skip=False)
    m.spatial_transformer("mid_attn", "middle_block.1", cfg.transformer_depth)
    m.resblock("mid_res2", "middle_block.2", has_skip=False)

    # skip-connection channel bookkeeping for the up path
    input_chs = [cfg.model_channels]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            input_chs.append(mult * cfg.model_channels)
        if level != len(cfg.channel_mult) - 1:
            input_chs.append(mult * cfg.model_channels)

    mo = 0
    ch = cfg.channel_mult[-1] * cfg.model_channels
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        out_ch = mult * cfg.model_channels
        for i in range(cfg.num_res_blocks + 1):
            skip_ch = input_chs.pop()
            my = f"up_{level}_{i}_res"
            m.resblock(my, f"output_blocks.{mo}.0", has_skip=(ch + skip_ch) != out_ch)
            ch = out_ch
            k = 1
            if ds in cfg.attention_resolutions:
                m.spatial_transformer(
                    f"up_{level}_{i}_attn", f"output_blocks.{mo}.1",
                    cfg.transformer_depth,
                )
                k = 2
            if i == cfg.num_res_blocks and level != 0:
                m.conv(f"up_{level}_us/conv", f"output_blocks.{mo}.{k}.conv")
                ds //= 2
            mo += 1

    m.gn("out_norm", "out.0")
    m.conv("out_conv", "out.2")
    return {"params": m.tree}


def export_unet(params: Dict, cfg, prefix: str = "") -> Dict:
    """flax UNet params → reference-layout torch-style state dict (numpy)."""
    m = _ExportMapper(params.get("params", params), prefix)
    convert_unet(None, cfg, mapper=m)
    m.assert_complete()
    return m.out


def convert_classifier_backbone(sd: StateDict, cfg, prefix: str = "",
                                mapper=None) -> Dict:
    """Classifier_Backbone state dict → flax params (encoder half + head)."""
    m = mapper or _Mapper(sd, prefix)
    m.dense("time_embed/dense0", "time_embed.0")
    m.dense("time_embed/dense1", "time_embed.2")
    m.conv("in_conv", "input_blocks.0.0")
    n = 1
    ds = 1
    ch = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = mult * cfg.model_channels
        for i in range(cfg.num_res_blocks):
            m.resblock(
                f"down_{level}_{i}_res", f"input_blocks.{n}.0", has_skip=ch != out_ch
            )
            ch = out_ch
            if ds in cfg.attention_resolutions:
                m.spatial_transformer(
                    f"down_{level}_{i}_attn", f"input_blocks.{n}.1",
                    cfg.transformer_depth,
                )
            n += 1
        if level != len(cfg.channel_mult) - 1:
            m.conv(f"down_{level}_ds/conv", f"input_blocks.{n}.0.op")
            n += 1
            ds *= 2
    m.resblock("mid_res1", "middle_block.0", has_skip=False)
    m.spatial_transformer("mid_attn", "middle_block.1", cfg.transformer_depth)
    m.resblock("mid_res2", "middle_block.2", has_skip=False)
    m.gn("out_norm", "out.0")
    m.conv("out_conv", "out.2")
    m.dense("classifier", "classifier")
    return {"params": m.tree}


def export_classifier_backbone(params: Dict, cfg, prefix: str = "") -> Dict:
    m = _ExportMapper(params.get("params", params), prefix)
    convert_classifier_backbone(None, cfg, mapper=m)
    m.assert_complete()
    return m.out


def _convert_vae_half(m: _Mapper, side: str, cfg) -> None:
    t = side  # "encoder" | "decoder"
    m.conv(f"{t}/conv_in", f"{t}.conv_in")
    levels = list(enumerate(cfg.ch_mult))
    if side == "encoder":
        ch = cfg.ch
        for level, mult in levels:
            out_ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                my = f"{t}/down_{level}_block{i}"
                tk = f"{t}.down.{level}.block.{i}"
                _vae_resblock(m, my, tk, ch != out_ch)
                ch = out_ch
            if level != len(levels) - 1:
                m.conv(f"{t}/down_{level}_ds/conv", f"{t}.down.{level}.downsample.conv")
    else:
        ch = cfg.ch * cfg.ch_mult[-1]
        for level, mult in reversed(levels):
            out_ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks + 1):
                my = f"{t}/up_{level}_block{i}"
                tk = f"{t}.up.{level}.block.{i}"
                _vae_resblock(m, my, tk, ch != out_ch)
                ch = out_ch
            if level != 0:
                m.conv(f"{t}/up_{level}_us/conv", f"{t}.up.{level}.upsample.conv")
    mid_ch = cfg.ch * cfg.ch_mult[-1]
    _vae_resblock(m, f"{t}/mid_block1", f"{t}.mid.block_1", False)
    m.gn_flat(f"{t}/mid_attn/norm", f"{t}.mid.attn_1.norm")
    for p in ("q", "k", "v", "proj_out"):
        m.conv(f"{t}/mid_attn/{p}", f"{t}.mid.attn_1.{p}")
    _vae_resblock(m, f"{t}/mid_block2", f"{t}.mid.block_2", False)
    m.gn_flat(f"{t}/norm_out", f"{t}.norm_out")
    m.conv(f"{t}/conv_out", f"{t}.conv_out")


def _vae_resblock(m: _Mapper, my: str, torch: str, has_skip: bool) -> None:
    m.gn_flat(f"{my}/norm1", f"{torch}.norm1")
    m.conv(f"{my}/conv1", f"{torch}.conv1")
    m.gn_flat(f"{my}/norm2", f"{torch}.norm2")
    m.conv(f"{my}/conv2", f"{torch}.conv2")
    if has_skip:
        m.conv(f"{my}/nin_shortcut", f"{torch}.nin_shortcut")


def convert_simple_decoder(sd: StateDict, prefix: str = "") -> Dict:
    """SimpleDecoder (stage1_autoencoder/model.py:666-699) → flax params."""
    m = _Mapper(sd, prefix)
    m.conv("conv0", "model.0")
    for i, my in enumerate(("res1", "res2", "res3"), start=1):
        _vae_resblock(m, my, f"model.{i}", has_skip=True)
    m.conv("conv4", "model.4")
    m.conv("upsample/conv", "model.5.conv")
    m.gn_flat("norm_out", "norm_out")
    m.conv("conv_out", "conv_out")
    return {"params": m.tree}


def convert_upsample_decoder(
    sd: StateDict, in_channels: int, ch: int, num_res_blocks: int,
    ch_mult=(2, 2), prefix: str = "",
) -> Dict:
    """UpsampleDecoder (model.py:702-747) → flax params."""
    m = _Mapper(sd, prefix)
    block_in = in_channels
    for level, mult in enumerate(ch_mult):
        block_out = ch * mult
        for i in range(num_res_blocks + 1):
            _vae_resblock(
                m, f"res_{level}_{i}", f"res_blocks.{level}.{i}",
                has_skip=block_in != block_out,
            )
            block_in = block_out
        if level != len(ch_mult) - 1:
            m.conv(f"up_{level}/conv", f"upsample_blocks.{level}.conv")
    m.gn_flat("norm_out", "norm_out")
    m.conv("conv_out", "conv_out")
    return {"params": m.tree}


def convert_latent_rescaler(
    sd: StateDict, depth: int = 2, prefix: str = "",
) -> Dict:
    """LatentRescaler (model.py:750-780) → flax params. All ResnetBlocks are
    mid→mid (conv_in projects first), so none have a shortcut conv."""
    m = _Mapper(sd, prefix)
    m.conv("conv_in", "conv_in")
    for i in range(depth):
        _vae_resblock(m, f"res1_{i}", f"res_block1.{i}", has_skip=False)
    m.gn_flat("attn/norm", "attn.norm")
    for p in ("q", "k", "v", "proj_out"):
        m.conv(f"attn/{p}", f"attn.{p}")
    for i in range(depth):
        _vae_resblock(m, f"res2_{i}", f"res_block2.{i}", has_skip=False)
    m.conv("conv_out", "conv_out")
    return {"params": m.tree}


def convert_vae(sd: StateDict, cfg, prefix: str = "", mapper=None) -> Dict:
    """AutoencoderKL state dict → flax params for models.vae.AutoencoderKL."""
    m = mapper or _Mapper(sd, prefix)
    _convert_vae_half(m, "encoder", cfg)
    _convert_vae_half(m, "decoder", cfg)
    m.conv("quant_conv", "quant_conv")
    m.conv("post_quant_conv", "post_quant_conv")
    return {"params": m.tree}


def export_vae(params: Dict, cfg, prefix: str = "") -> Dict:
    m = _ExportMapper(params.get("params", params), prefix)
    convert_vae(None, cfg, mapper=m)
    m.assert_complete()
    return m.out


def convert_cond_encoder(sd: StateDict, prefix: str = "", mapper=None) -> Dict:
    """Video_Feat_Encoder_Posembed state dict → flax params."""
    m = mapper or _Mapper(sd, prefix)
    m.dense("embedder", "embedder.0")
    m.take("pos_emb", "pos_emb.weight", _id)
    return {"params": m.tree}


def export_cond_encoder(params: Dict, prefix: str = "") -> Dict:
    m = _ExportMapper(params.get("params", params), prefix)
    convert_cond_encoder(None, mapper=m)
    m.assert_complete()
    return m.out


def _token_transformer_blocks(m: _Mapper, my: str, torch: str, depth: int):
    """BasicTransformerBlock stack mapping — the ONE copy of this loop
    (used by _Mapper.spatial_transformer, the 1D converter, and FusionNet).
    Empty `my`/`torch` prefixes map blocks at the root."""
    myp = f"{my}/" if my else ""
    tp = f"{torch}." if torch else ""
    for d in range(depth):
        tb = f"{tp}transformer_blocks.{d}"
        mb = f"{myp}block{d}"
        for n in (1, 2, 3):
            m.gn_flat(f"{mb}/norm{n}", f"{tb}.norm{n}")
        for a in ("attn1", "attn2"):
            m.dense(f"{mb}/{a}/to_q", f"{tb}.{a}.to_q", bias=False)
            m.dense(f"{mb}/{a}/to_k", f"{tb}.{a}.to_k", bias=False)
            m.dense(f"{mb}/{a}/to_v", f"{tb}.{a}.to_v", bias=False)
            m.dense(f"{mb}/{a}/to_out", f"{tb}.{a}.to_out.0")
        m.dense_halves(f"{mb}/ff/geglu/proj_x", f"{mb}/ff/geglu/proj_gate",
                       f"{tb}.ff.net.0.proj")
        m.dense(f"{mb}/ff/out", f"{tb}.ff.net.2")


def convert_cond_encoder_mlp(sd: StateDict, prefix: str = "") -> Dict:
    """Video_Feat_Encoder (adm video_feat_encoder.py:6-23) → flax params."""
    m = _Mapper(sd, prefix)
    m.dense("embedder_0", "embedder.0")
    m.dense("embedder_2", "embedder.2")
    return {"params": m.tree}


def convert_cond_encoder_simple(sd: StateDict, prefix: str = "") -> Dict:
    """Video_Feat_Encoder_simple (video_feat_encoder.py:28-39)."""
    m = _Mapper(sd, prefix)
    m.dense("embedder", "embedder.0")
    return {"params": m.tree}


def convert_cond_encoder_ar(
    sd: StateDict, prefix: str = "", depth: int = 2
) -> Dict:
    """Video_Feat_Encoder_Posembed_AR (video_feat_encoder.py:91-127) +
    FusionNet/SpatialTransformer_Cond → flax params."""
    m = _Mapper(sd, prefix)
    m.dense("embed_video_feat", "embed_video_feat.0")
    m.conv("embed_spec_feat", "embed_spec_feat.0")
    m.take("pos_emb_video", "pos_emb_video.weight", _id)
    m.take("pos_emb_spec", "pos_emb_spec.weight", _id)
    fm = "fusion_net/fusion_module"
    tt = "fusion_net.fusion_module"
    m.gn_flat(f"{fm}/norm", f"{tt}.norm")
    m.dense(f"{fm}/proj_in", f"{tt}.proj_in")
    _token_transformer_blocks(m, fm, tt, depth)
    m.dense(f"{fm}/proj_out", f"{tt}.proj_out")
    m.dense("fusion_net/proj_out", "fusion_net.proj_out.0")
    return {"params": m.tree}


def export_ldm_state_dict(params: Dict, vae_params: Dict, unet_cfg, vae_cfg) -> Dict:
    """Full LatentDiffusion composite export: the inverse of
    split_ldm_state_dict + the three converters — lets a model trained here
    be loaded by the reference torch code."""
    out = {}
    out.update(export_unet(params["unet"], unet_cfg, "model.diffusion_model."))
    out.update(export_cond_encoder(params["cond"], "cond_stage_model."))
    out.update(export_vae(vae_params, vae_cfg, "first_stage_model."))
    return out


def _conv3d(t) -> np.ndarray:
    # torch Conv3d (O, I, kT, kH, kW) → flax (kT, kH, kW, I, O)
    return _np(t).transpose(2, 3, 4, 1, 0)


_INVERSE.update({_conv: _conv_inv, _dense: lambda a: np.asarray(a).T,
                 _id: np.asarray, _conv3d: _conv3d_inv})


class _BNMapper(_Mapper):
    """Mapper that also collects BatchNorm running stats (batch_stats)."""

    def __init__(self, sd: StateDict, prefix: str = ""):
        super().__init__(sd, prefix)
        self.stats: Dict = {}

    def bn(self, my: str, torch: str) -> None:
        self.take(f"{my}/scale", f"{torch}.weight", _id)
        self.take(f"{my}/bias", f"{torch}.bias", _id)
        for src, dst in (("running_mean", "mean"), ("running_var", "var")):
            key = f"{self.prefix}{torch}.{src}"
            _set(self.stats, f"{my}/{dst}", _id(self.sd[key]))
            self.used.add(key)

    def conv3d(self, my: str, torch: str) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _conv3d)

    def conv2d_nobias(self, my: str, torch: str) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _conv)

    def result(self) -> Dict:
        return {"params": self.tree, "batch_stats": self.stats}


def _walk_cnn14(m) -> None:
    """Shared layout walk for PANN Cnn14 (`open_clip/cnn10.py:297-330`):
    bn, conv_block{1..6}.{conv1,bn1,conv2,bn2}, fc1, final_project."""
    m.bn("bn0", "bn")
    for i in range(1, 7):
        for j in (1, 2):
            m.conv2d_nobias(f"conv_block{i}/conv{j}", f"conv_block{i}.conv{j}")
            m.bn(f"conv_block{i}/bn{j}", f"conv_block{i}.bn{j}")
    m.dense("fc1", "fc1")
    m.dense("final_project", "final_project")


def _walk_slowonly(m, stage_blocks=(3, 4, 6, 3)) -> None:
    """Shared layout walk for mmaction ResNet3dSlowOnly
    (`audio_contrastive.py:345-1277`): conv1.conv/bn,
    layer{s}.{b}.conv{1,2,3}.conv/bn, layer{s}.{b}.downsample.conv/bn."""

    def convmod(my: str, torch: str) -> None:
        m.conv3d(f"{my}/conv", f"{torch}.conv")
        m.bn(f"{my}/bn", f"{torch}.bn")

    convmod("conv1", "conv1")
    for s, blocks in enumerate(stage_blocks, start=1):
        for b in range(blocks):
            my = f"layer{s}_{b}"
            tk = f"layer{s}.{b}"
            for c in ("conv1", "conv2", "conv3"):
                convmod(f"{my}/{c}", f"{tk}.{c}")
            if b == 0:
                convmod(f"{my}/downsample", f"{tk}.downsample")


def convert_cnn14(sd: StateDict, prefix: str = "") -> Dict:
    """PANN Cnn14 state dict → flax params+batch_stats for cavp.Cnn14."""
    m = _BNMapper(sd, prefix)
    _walk_cnn14(m)
    return m.result()


def convert_slowonly(sd: StateDict, prefix: str = "",
                     stage_blocks=(3, 4, 6, 3)) -> Dict:
    """mmaction ResNet3dSlowOnly state dict → flax params+batch_stats."""
    m = _BNMapper(sd, prefix)
    _walk_slowonly(m, stage_blocks)
    return m.result()


def convert_cavp(sd: StateDict, prefix: str = "") -> Dict:
    """Full CLIP_Video_Spec / CAVP_Inference state dict → CAVPModel variables.

    Key layout: `open_clip/model.py:457-671` (video_encoder.*,
    video_project_head.*, spec_encoder.*, logit_scale).
    """
    video = convert_slowonly(sd, prefix + "video_encoder.")
    spec = convert_cnn14(sd, prefix + "spec_encoder.")
    head_m = _Mapper(sd, prefix)
    head_m.dense("video_project_head", "video_project_head")
    params = {
        "video_encoder": video["params"],
        "spec_encoder": spec["params"],
        **head_m.tree,
        "logit_scale": _id(sd[prefix + "logit_scale"]).reshape(()),
    }
    stats = {
        "video_encoder": video["batch_stats"],
        "spec_encoder": spec["batch_stats"],
    }
    return {"params": params, "batch_stats": stats}


class _BNExportMapper(_ExportMapper):
    """Export direction of _BNMapper: flax params+batch_stats → reference
    torch key layout, including BatchNorm running stats and
    num_batches_tracked (torch BN buffers the reference state_dict carries)."""

    def __init__(self, variables: Dict, prefix: str = ""):
        super().__init__(variables.get("params", {}), prefix)
        self.stats = variables.get("batch_stats", {})
        self._n_stats_exported = 0

    def bn(self, my: str, torch: str) -> None:
        self.take(f"{my}/scale", f"{torch}.weight", _id)
        self.take(f"{my}/bias", f"{torch}.bias", _id)
        for src, dst in (("mean", "running_mean"), ("var", "running_var")):
            self.out[self.prefix + f"{torch}.{dst}"] = np.asarray(
                _get(self.stats, f"{my}/{src}")
            )
            self._n_stats_exported += 1
        # torch BN state dicts include this counter buffer; the value only
        # matters for momentum=None BN, which the reference never uses
        self.out[self.prefix + f"{torch}.num_batches_tracked"] = np.asarray(
            0, dtype=np.int64
        )

    def conv3d(self, my: str, torch: str) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _conv3d)

    def conv2d_nobias(self, my: str, torch: str) -> None:
        self.take(f"{my}/kernel", f"{torch}.weight", _conv)

    def assert_complete(self) -> None:
        super().assert_complete()
        n_stats = len(jax.tree_util.tree_leaves(self.stats))
        if n_stats != self._n_stats_exported:
            raise ValueError(
                f"export incomplete: {self._n_stats_exported} exported "
                f"batch-stat leaves for {n_stats} present"
            )


def export_cavp(variables: Dict, prefix: str = "") -> Dict:
    """flax CAVPModel variables → reference CLIP_Video_Spec state dict
    (numpy arrays, torch key layout `open_clip/model.py:457-671`).

    The two-way door for stage 1: a CAVP trained here loads back into the
    reference factory (`create_model_video_spec`) / `CAVP_Inference`.
    Wrap with `export_cavp_checkpoint` for the training-checkpoint envelope.
    """
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})

    def sub(name):
        return {
            "params": params.get(name, {}),
            "batch_stats": stats.get(name, {}),
        }

    mv = _BNExportMapper(sub("video_encoder"), prefix + "video_encoder.")
    _walk_slowonly(mv)
    mv.assert_complete()
    ms = _BNExportMapper(sub("spec_encoder"), prefix + "spec_encoder.")
    _walk_cnn14(ms)
    ms.assert_complete()
    mh = _ExportMapper({"video_project_head": params["video_project_head"]},
                       prefix)
    mh.dense("video_project_head", "video_project_head")
    mh.assert_complete()
    out = {**mv.out, **ms.out, **mh.out}
    out[prefix + "logit_scale"] = np.asarray(params["logit_scale"]).reshape(())
    # spec_project_head is Identity in the shipped config (model.py:543-551):
    # no parameters to emit.
    return out


def export_cavp_checkpoint(variables: Dict, epoch: int = 0,
                           name: str = "diff_foley_tpu_cavp") -> Dict:
    """Wrap an exported CAVP state dict in the reference training-checkpoint
    envelope (`main_wds_intra_contrast.py:393-421`): {epoch, name,
    state_dict}; optimizer/scaler states are torch-specific and omitted —
    the reference's resume path only requires them when resuming training."""
    return {
        "epoch": epoch,
        "name": name,
        "state_dict": export_cavp(variables),
    }


def split_ldm_state_dict(sd: StateDict) -> Tuple[Dict, Dict, Dict]:
    """Split a composite LatentDiffusion checkpoint into its three sub-dicts."""
    unet, vae, cond = {}, {}, {}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            unet[k[len("model.diffusion_model.") :]] = v
        elif k.startswith("first_stage_model."):
            vae[k[len("first_stage_model.") :]] = v
        elif k.startswith("cond_stage_model."):
            cond[k[len("cond_stage_model.") :]] = v
    return unet, vae, cond


def merge_params(init_tree, loaded_tree, _path=""):
    """strict=False checkpoint semantics (reference ddpm.py:191-207 /
    demo_util.py:113-121): take loaded values where the key exists and the
    shape matches, keep the initialisation otherwise.

    Returns (merged, missing_keys, unexpected_keys).
    """
    missing, unexpected = [], []

    def walk(init, loaded, path):
        if isinstance(init, dict):
            out = {}
            loaded = loaded if isinstance(loaded, dict) else {}
            for k, v in init.items():
                if k in loaded:
                    out[k] = walk(v, loaded[k], f"{path}/{k}")
                else:
                    missing.append(f"{path}/{k}")
                    out[k] = v
            for k in loaded:
                if k not in init:
                    unexpected.append(f"{path}/{k}")
            return out
        if loaded is None or getattr(loaded, "shape", None) != getattr(
            init, "shape", None
        ):
            missing.append(path)
            return init
        return loaded

    merged = walk(init_tree, loaded_tree, _path)
    return merged, missing, unexpected


def inflate_resnet50_to_slowonly(sd: StateDict, prefix: str = "",
                                 stage_blocks=(3, 4, 6, 3)) -> Dict:
    """torchvision ResNet-50 (2D) → SlowOnly-R50 (3D) weight inflation.

    Mirrors mmaction's _inflate_weights (audio_contrastive.py:706-766): each
    2D kernel is expanded along the temporal axis to the 3D kernel's t-size
    and divided by t (magnitude preserved); BN stats copy over directly.
    Temporal sizes follow the SlowOnly config: stem (1,7,7); stages 1-2
    conv1 t=1; stages 3-4 conv1 t=3 (inflate 3x1x1); all conv2/conv3 t=1.
    """
    m = _BNMapper(sd, prefix)

    def inflate(my: str, torch_key: str, t: int) -> None:
        w = _np(m.sd[m.prefix + torch_key + ".weight"])  # (O, I, kh, kw)
        w3 = np.repeat(w[:, :, None, :, :], t, axis=2) / float(t)
        _set(m.tree, f"{my}/conv/kernel", w3.transpose(2, 3, 4, 1, 0))
        m.used.add(m.prefix + torch_key + ".weight")

    def bn(my: str, torch_key: str) -> None:
        m.take(f"{my}/bn/scale", f"{torch_key}.weight", _id)
        m.take(f"{my}/bn/bias", f"{torch_key}.bias", _id)
        for src, dst in (("running_mean", "mean"), ("running_var", "var")):
            _set(m.stats, f"{my}/bn/{dst}", _id(m.sd[m.prefix + f"{torch_key}.{src}"]))

    inflate("conv1", "conv1", 1)
    bn("conv1", "bn1")
    inflate_t = {1: 1, 2: 1, 3: 3, 4: 3}  # conv1 temporal size per stage
    for s, blocks in enumerate(stage_blocks, start=1):
        for b in range(blocks):
            my = f"layer{s}_{b}"
            tk = f"layer{s}.{b}"
            inflate(f"{my}/conv1", f"{tk}.conv1", inflate_t[s])
            bn(f"{my}/conv1", f"{tk}.bn1")
            inflate(f"{my}/conv2", f"{tk}.conv2", 1)
            bn(f"{my}/conv2", f"{tk}.bn2")
            inflate(f"{my}/conv3", f"{tk}.conv3", 1)
            bn(f"{my}/conv3", f"{tk}.bn3")
            if b == 0:
                inflate(f"{my}/downsample", f"{tk}.downsample.0", 1)
                bn(f"{my}/downsample", f"{tk}.downsample.1")
    return m.result()


def init_cavp_pretrained_towers(cavp_variables: Dict,
                                slowonly_kinetics_sd: Optional[StateDict] = None,
                                cnn14_pann_sd: Optional[StateDict] = None):
    """CAVP tower init from pretrained ckpts (model.py:557-573):
    Kinetics-400 SlowOnly ('backbone.'-prefixed) and PANN Cnn14_16k
    ({'model': ...} payload), merged strict=False into fresh variables."""
    params = cavp_variables["params"]
    stats = cavp_variables.get("batch_stats", {})
    report = {}
    if slowonly_kinetics_sd is not None:
        sd = {
            k[len("backbone.") :] if k.startswith("backbone.") else k: v
            for k, v in slowonly_kinetics_sd.items()
        }
        conv = convert_slowonly(sd)
        params["video_encoder"], mis, unexp = merge_params(
            params["video_encoder"], conv["params"]
        )
        stats["video_encoder"], _, _ = merge_params(
            stats["video_encoder"], conv["batch_stats"]
        )
        report["video"] = (mis, unexp)
    if cnn14_pann_sd is not None:
        sd = cnn14_pann_sd.get("model", cnn14_pann_sd)
        conv = convert_cnn14(sd)
        params["spec_encoder"], mis, unexp = merge_params(
            params["spec_encoder"], conv["params"]
        )
        stats["spec_encoder"], _, _ = merge_params(
            stats["spec_encoder"], conv["batch_stats"]
        )
        report["spec"] = (mis, unexp)
    return {"params": params, "batch_stats": stats}, report


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch checkpoint on CPU; unwrap Lightning/DDP wrappers.

    Mirrors the reference's resume logic (`main_wds_intra_contrast.py:303-322`):
    accept {'state_dict': ...} payloads and strip a leading 'module.'.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Alternate CAVP encoder converters (factory towers, model.py:490-620)
# ---------------------------------------------------------------------------

def _conv1d(t) -> np.ndarray:  # torch (O, I, k) → flax (k, I, O)
    return _np(t).transpose(2, 1, 0)


def convert_x3d(sd: StateDict, prefix: str = "",
                base_blocks=(1, 2, 5, 3), depth_factor: float = 5.0) -> Dict:
    """PySlowFast X3D state dict → flax variables for cavp.x3d.X3D.

    Key layout: `open_clip/x3d.py:1504-1646` (s1.pathway0_stem.{conv_xy,conv,
    bn}, s{2..5}.pathway0_res{i}.branch2.{a,b,c,*_bn,se}, branch1(+_bn) on the
    first block, head.{conv_5,conv_5_bn,lin_5,projection}).
    """
    import math

    m = _BNMapper(sd, prefix)
    m.conv3d("s1/conv_xy", "s1.pathway0_stem.conv_xy")
    m.conv3d("s1/conv", "s1.pathway0_stem.conv")
    m.bn("s1/norm/bn", "s1.pathway0_stem.bn")
    for stage, base_n in enumerate(base_blocks, start=2):
        n_rep = int(math.ceil(depth_factor * base_n))
        for i in range(n_rep):
            my = f"s{stage}_b{i}"
            tk = f"s{stage}.pathway0_res{i}.branch2"
            for c in ("a", "b", "c"):
                m.conv3d(f"{my}/{c}", f"{tk}.{c}")
                m.bn(f"{my}/{c}_bn/bn", f"{tk}.{c}_bn")
            if (i + 1) % 2 == 1:  # SE on even block idx (x3d.py:624)
                for fc in ("fc1", "fc2"):
                    m.conv3d(f"{my}/se/{fc}", f"{tk}.se.{fc}")
                    m.take(f"{my}/se/{fc}/bias", f"{tk}.se.{fc}.bias", _id)
            if i == 0:
                m.conv3d(f"{my}/branch1", f"s{stage}.pathway0_res{i}.branch1")
                m.bn(f"{my}/branch1_bn/bn",
                     f"s{stage}.pathway0_res{i}.branch1_bn")
    m.conv3d("conv_5", "head.conv_5")
    m.bn("conv_5_bn/bn", "head.conv_5_bn")
    # lin_5: 1×1×1 conv used as a Dense after pooling
    w = _np(sd[prefix + "head.lin_5.weight"])  # (O, I, 1, 1, 1)
    _set(m.tree, "lin_5/kernel", w.reshape(w.shape[0], w.shape[1]).T)
    m.dense("projection", "head.projection")
    return m.result()


def convert_i3d(sd: StateDict, prefix: str = "",
                stage_blocks=(3, 4, 6, 3)) -> Dict:
    """PySlowFast I3D ResNet state dict → flax variables for cavp.x3d.I3DResNet.

    Key layout: `open_clip/x3d.py:1862-2073` (s1.pathway0_stem.{conv,bn},
    s{2..5}.pathway0_res{i}.branch2.*, head.projection).
    """
    m = _BNMapper(sd, prefix)
    m.conv3d("stem_conv", "s1.pathway0_stem.conv")
    m.bn("stem_bn/bn", "s1.pathway0_stem.bn")
    for stage, blocks in enumerate(stage_blocks, start=2):
        for i in range(blocks):
            my = f"s{stage}_b{i}"
            tk = f"s{stage}.pathway0_res{i}.branch2"
            for c in ("a", "b", "c"):
                m.conv3d(f"{my}/{c}", f"{tk}.{c}")
                m.bn(f"{my}/{c}_bn/bn", f"{tk}.{c}_bn")
            if i == 0:
                m.conv3d(f"{my}/branch1", f"s{stage}.pathway0_res{i}.branch1")
                m.bn(f"{my}/branch1_bn/bn",
                     f"s{stage}.pathway0_res{i}.branch1_bn")
    m.dense("projection", "head.projection")
    return m.result()


def convert_r2plus1d(sd: StateDict, prefix: str = "",
                     stage_blocks=(3, 4, 6, 3)) -> Dict:
    """mmaction ResNet2Plus1d(-34) state dict → flax variables for
    cavp.r2plus1d.ResNet2Plus1d.

    Key layout: `open_clip/resnet2plus1d.py:1212-1277` (conv1.conv.{conv_s,
    bn_s,conv_t} + conv1.bn, layer{1..4}.{i}.conv{1,2}/downsample with the
    same factorised-conv nesting, project).
    """
    m = _BNMapper(sd, prefix)

    def convmod(my: str, torch: str) -> None:
        m.conv3d(f"{my}/conv/conv_s", f"{torch}.conv.conv_s")
        m.bn(f"{my}/conv/bn_s", f"{torch}.conv.bn_s")
        m.conv3d(f"{my}/conv/conv_t", f"{torch}.conv.conv_t")
        m.bn(f"{my}/bn", f"{torch}.bn")

    convmod("conv1", "conv1")
    for s, blocks in enumerate(stage_blocks, start=1):
        for b in range(blocks):
            my = f"layer{s}_{b}"
            tk = f"layer{s}.{b}"
            convmod(f"{my}/conv1", f"{tk}.conv1")
            convmod(f"{my}/conv2", f"{tk}.conv2")
            if b == 0 and s > 1:
                convmod(f"{my}/downsample", f"{tk}.downsample")
    m.dense("project", "project")
    return m.result()


def convert_spec_resnet50(sd: StateDict, prefix: str = "",
                          stage_blocks=(3, 4, 6, 3)) -> Dict:
    """Audio spec ResNet-50 state dict → flax variables for
    cavp.spec_towers.SpecResNet50.

    Key layout: `open_clip/audio_contrastive.py:1344-1404` (conv1.{0,1},
    conv{2..5}_x.{i}.residual_function.{0,1,3,4,6,7} + shortcut.{0,1}).
    """
    m = _BNMapper(sd, prefix)
    m.conv2d_nobias("stem_conv", "conv1.0")
    m.bn("stem_bn", "conv1.1")
    for stage, blocks in enumerate(stage_blocks, start=2):
        for b in range(blocks):
            my = f"conv{stage}_{b}"
            tk = f"conv{stage}_x.{b}.residual_function"
            for j, (conv_i, bn_i) in enumerate(((0, 1), (3, 4), (6, 7)), 1):
                m.conv2d_nobias(f"{my}/conv{j}", f"{tk}.{conv_i}")
                m.bn(f"{my}/bn{j}", f"{tk}.{bn_i}")
            if b == 0:
                sc = f"conv{stage}_x.{b}.shortcut"
                m.conv2d_nobias(f"{my}/shortcut_conv", f"{sc}.0")
                m.bn(f"{my}/shortcut_bn", f"{sc}.1")
    return m.result()


def convert_spec_vit(sd: StateDict, prefix: str = "", layers: int = 12,
                     cls_token: bool = True) -> Dict:
    """Spec_VIT / Spec_VIT_mean state dict → flax params for
    cavp.spec_towers.SpecViT / SpecViTMean.

    Key layout: `open_clip/audio_contrastive.py:1599-1771` (conv1,
    class_embedding, positional_embedding, ln_pre/ln_post,
    transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp}, proj).
    """
    m = _Mapper(sd, prefix)
    m.take("conv1/kernel", "conv1.weight", _conv1d)
    if cls_token:
        m.take("class_embedding", "class_embedding", _id)
    m.take("positional_embedding", "positional_embedding", _id)
    for ln in ("ln_pre", "ln_post"):
        m.take(f"{ln}/scale", f"{ln}.weight", _id)
        m.take(f"{ln}/bias", f"{ln}.bias", _id)
    for i in range(layers):
        my = f"block{i}"
        tk = f"transformer.resblocks.{i}"
        for ln in ("ln_1", "ln_2"):
            m.take(f"{my}/{ln}/scale", f"{tk}.{ln}.weight", _id)
            m.take(f"{my}/{ln}/bias", f"{tk}.{ln}.bias", _id)
        m.take(f"{my}/attn/in_proj/kernel", f"{tk}.attn.in_proj_weight",
               _dense)
        m.take(f"{my}/attn/in_proj/bias", f"{tk}.attn.in_proj_bias", _id)
        m.dense(f"{my}/attn/out_proj", f"{tk}.attn.out_proj")
        m.dense(f"{my}/c_fc", f"{tk}.mlp.c_fc")
        m.dense(f"{my}/c_proj", f"{tk}.mlp.c_proj")
    m.take("proj", "proj", _id)
    return {"params": m.tree}


# ---------------------------------------------------------------------------
# LPIPS / LPAPS perceptual-metric converters
# ---------------------------------------------------------------------------

# torchvision vgg16.features conv indices and their slice modules
_VGG_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_SLICE_BOUNDS = (4, 9, 16, 23, 30)  # slice1..slice5 end indices


def _vgg_slice_of(idx: int) -> int:
    for s, bound in enumerate(_VGG_SLICE_BOUNDS, start=1):
        if idx < bound:
            return s
    raise ValueError(idx)


def _convert_perceptual(sd: StateDict, prefix: str, shift_key: str,
                        scale_key: str) -> Dict:
    m = _Mapper(sd, prefix)
    for my_i, t_i in enumerate(_VGG_TORCH_CONV_IDX):
        m.conv(f"net/conv{my_i}", f"net.slice{_vgg_slice_of(t_i)}.{t_i}")
    for k in range(5):
        # 1×1 conv head (1, C, 1, 1) → flax Conv kernel (1, 1, C, 1)
        m.take(f"lin{k}/kernel", f"lin{k}.model.1.weight", _conv)
    _set(m.tree, "shift", _np(sd[prefix + shift_key]).reshape(-1))
    _set(m.tree, "scale", _np(sd[prefix + scale_key]).reshape(-1))
    return {"params": m.tree}


def convert_lpips(sd: StateDict, prefix: str = "") -> Dict:
    """LPIPS state dict (taming/lpips.py:54) → flax params for
    train.perceptual.LPIPS (scaling_layer buffers, net.slice*.N convs,
    lin{0..4}.model.1 heads)."""
    return _convert_perceptual(
        sd, prefix, "scaling_layer.shift", "scaling_layer.scale"
    )


def convert_lpaps(sd: StateDict, prefix: str = "") -> Dict:
    """LPAPS state dict (adm/modules/losses/lpaps.py:21) → flax params for
    train.perceptual.LPAPS (per-frequency scaling stats)."""
    return _convert_perceptual(
        sd, prefix, "scaling_layer.shift", "scaling_layer.scale"
    )


def convert_vivit(sd: StateDict, prefix: str = "", spatial_depth: int = 8,
                  temporal_depth: int = 4, temporal_cls: bool = True) -> Dict:
    """ViViT / ViViT_mean state dict (stage2_decode/vit.py:85-283) → flax
    params for models.vivit.ViViT / ViViTMean."""
    m = _Mapper(sd, prefix)
    for ln, idx in (("patch_norm1", 1), ("patch_norm2", 3)):
        m.take(f"{ln}/scale", f"to_patch_embedding.{idx}.weight", _id)
        m.take(f"{ln}/bias", f"to_patch_embedding.{idx}.bias", _id)
    m.dense("patch_proj", "to_patch_embedding.2")
    m.take("pos_embedding", "pos_embedding", _id)
    m.take("spatial_cls_token", "spatial_cls_token", _id)
    if temporal_cls:
        m.take("temporal_cls_token", "temporal_cls_token", _id)
    for name, depth in (("spatial_transformer", spatial_depth),
                        ("temporal_transformer", temporal_depth)):
        for i in range(depth):
            tk = f"{name}.layers.{i}"
            my = f"{name}"
            m.take(f"{my}/attn{i}_norm/scale", f"{tk}.0.norm.weight", _id)
            m.take(f"{my}/attn{i}_norm/bias", f"{tk}.0.norm.bias", _id)
            m.dense(f"{my}/attn{i}/to_qkv", f"{tk}.0.fn.to_qkv", bias=False)
            m.dense(f"{my}/attn{i}/to_out", f"{tk}.0.fn.to_out.0")
            m.take(f"{my}/ff{i}_norm/scale", f"{tk}.1.norm.weight", _id)
            m.take(f"{my}/ff{i}_norm/bias", f"{tk}.1.norm.bias", _id)
            m.dense(f"{my}/ff{i}_in", f"{tk}.1.fn.net.0")
            m.dense(f"{my}/ff{i}_out", f"{tk}.1.fn.net.3")
    return {"params": m.tree}


def _lstm_layer(m: _Mapper, my: str, torch_prefix: str, layer: int) -> None:
    """torch nn.LSTM layer → flax OptimizedLSTMCell gates (order i,f,g,o;
    combined ih+hh biases live on the h-side Denses)."""
    w_ih = _np(m.sd[m.prefix + f"{torch_prefix}.weight_ih_l{layer}"])
    w_hh = _np(m.sd[m.prefix + f"{torch_prefix}.weight_hh_l{layer}"])
    b = (_np(m.sd[m.prefix + f"{torch_prefix}.bias_ih_l{layer}"])
         + _np(m.sd[m.prefix + f"{torch_prefix}.bias_hh_l{layer}"]))
    hdim = w_hh.shape[1]
    cell = f"{my}/OptimizedLSTMCell_{layer}"
    for g, name in enumerate(("i", "f", "g", "o")):
        sl = slice(g * hdim, (g + 1) * hdim)
        _set(m.tree, f"{cell}/i{name}/kernel", w_ih[sl].T)
        _set(m.tree, f"{cell}/h{name}/kernel", w_hh[sl].T)
        _set(m.tree, f"{cell}/h{name}/bias", b[sl])


def _conv1d_full(m: _Mapper, my: str, torch: str) -> None:
    m.take(f"{my}/kernel", f"{torch}.weight", _conv1d)
    m.take(f"{my}/bias", f"{torch}.bias", _id)


def convert_sound_vae(sd: StateDict, prefix: str = "", n_blocks: int = 4,
                      lstm_layers: int = 2) -> Dict:
    """Sound_AutoencoderKL state dict (adm/models/autoencoder.py:14 +
    stage1_model/model.py) → flax params for models.sound_vae.

    Key layout: encoder.layers.{0 stem, 2+2i blocks}.layers.{0 res, 2 down},
    encoder.lstm.0.*_l{n}, encoder.last_conv.1; decoder.layers1.0,
    decoder.lstm.0, decoder.layers2.{1+2j}.layers.{0 res, 2 up},
    decoder.last_conv.0.
    """
    m = _Mapper(sd, prefix)
    # ---- encoder ----------------------------------------------------------
    _conv1d_full(m, "encoder/stem", "encoder.layers.0")
    for i in range(n_blocks):
        blk = f"encoder.layers.{2 + 2 * i}.layers"
        _conv1d_full(m, f"encoder/block{i}_res/conv1", f"{blk}.0.layers.0")
        _conv1d_full(m, f"encoder/block{i}_res/conv2", f"{blk}.0.layers.2")
        _conv1d_full(m, f"encoder/block{i}_down", f"{blk}.2.layers.0")
    for n in range(lstm_layers):
        _lstm_layer(m, "encoder/lstm", "encoder.lstm.0", n)
    _conv1d_full(m, "encoder/last_conv", "encoder.last_conv.1")
    # ---- decoder ----------------------------------------------------------
    _conv1d_full(m, "decoder/stem", "decoder.layers1.0")
    for n in range(lstm_layers):
        _lstm_layer(m, "decoder/lstm", "decoder.lstm.0", n)
    for j in range(n_blocks):
        blk = f"decoder.layers2.{1 + 2 * j}.layers"
        _conv1d_full(m, f"decoder/block{j}_res/conv1", f"{blk}.0.layers.0")
        _conv1d_full(m, f"decoder/block{j}_res/conv2", f"{blk}.0.layers.2")
        # ConvTranspose1d (in, out, k) → flax transpose_kernel=True (k,out,in)
        w = _np(sd[prefix + f"decoder.layers2.{1 + 2 * j}.layers.2.layers.0.weight"])
        _set(m.tree, f"decoder/block{j}_up/kernel", w.transpose(2, 1, 0))
        m.take(f"decoder/block{j}_up/bias",
               f"decoder.layers2.{1 + 2 * j}.layers.2.layers.0.bias", _id)
    _conv1d_full(m, "decoder/last_conv", "decoder.last_conv.0")
    return {"params": m.tree}


def convert_spatial_transformer1d(sd: StateDict, prefix: str = "",
                                  depth: int = 1) -> Dict:
    """1D SpatialTransformer state dict (diff_foley/modules/diffusionmodules/
    attention.py:218-297) → flax params for attention.SpatialTransformer1D."""
    m = _Mapper(sd, prefix)
    m.gn_flat("norm", "norm")
    _conv1d_full(m, "proj_in", "proj_in")
    _token_transformer_blocks(m, "", "", depth)
    _conv1d_full(m, "proj_out", "proj_out")
    return {"params": m.tree}


def convert_cnn10(sd: StateDict, prefix: str = "") -> Dict:
    """PANN Cnn10 state dict (open_clip/cnn10.py:226-295) → flax variables
    for cavp.cnn14.Cnn10 (5 conv blocks, fc1 1024)."""
    m = _BNMapper(sd, prefix)
    m.bn("bn0", "bn0")
    for i in range(1, 6):
        for j in (1, 2):
            m.conv2d_nobias(f"conv_block{i}/conv{j}", f"conv_block{i}.conv{j}")
            m.bn(f"conv_block{i}/bn{j}", f"conv_block{i}.bn{j}")
    m.dense("fc1", "fc1")
    m.dense("final_project", "final_project")
    return m.result()
