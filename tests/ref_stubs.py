"""Shared stubs for importing reference torch modules standalone.

The reference towers import mmcv / fvcore, which aren't in this image. These
stubs provide just enough surface (ConvModule with conv_cfg dispatch,
Registry, build_norm_layer, CfgNode, weight-init no-ops) to construct the
actual reference models for side-by-side numerics.
"""
import importlib.machinery
import importlib.util
import sys
import types

import torch
import torch.nn as tnn


class _Registry:
    def __init__(self, name="", parent=None, scope=None):
        self._m = {}

    def register_module(self, *a, **k):
        def deco(cls):
            self._m[cls.__name__] = cls
            return cls

        return deco

    def get(self, name):
        return self._m[name]

    def build(self, cfg):
        cfg = dict(cfg)
        cls = self.get(cfg.pop("type"))
        return cls(**cfg)


_CONV_LAYERS = _Registry("conv layer")


def _build_norm_layer(norm_cfg, num_features):
    eps = (norm_cfg or {}).get("eps", 1e-5)
    return "bn", tnn.BatchNorm3d(num_features, eps=eps)


class _ConvModule(tnn.Module):
    """mmcv ConvModule: conv (via conv_cfg registry) → BN → optional ReLU."""

    def __init__(self, in_ch, out_ch, kernel=None, stride=1, padding=0,
                 dilation=1, bias=False, conv_cfg=None, norm_cfg=None,
                 act_cfg="default", groups=1, kernel_size=None):
        super().__init__()
        k = kernel if kernel is not None else kernel_size
        ctype = (conv_cfg or {}).get("type", "Conv3d")
        if ctype == "Conv3d":
            self.conv = tnn.Conv3d(
                in_ch, out_ch, k, stride=stride, padding=padding,
                dilation=dilation, bias=bias, groups=groups,
            )
        else:
            self.conv = _CONV_LAYERS.get(ctype)(
                in_ch, out_ch, k, stride=stride, padding=padding,
                dilation=dilation, groups=groups, bias=bias,
            )
        _, self.bn = _build_norm_layer(norm_cfg, out_ch)
        self.with_act = act_cfg is not None

    @property
    def norm(self):
        # real mmcv registers the norm layer ONLY under norm_name ('bn' for
        # BatchNorm), exposing `.norm` as a property — registering it as a
        # second submodule here would put phantom `.norm.*` keys in
        # state_dict() that no real mmaction checkpoint has.
        return self.bn

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.with_act else x


def install_mmcv_stub():
    if "mmcv" in sys.modules:
        return

    def _noop(*a, **k):
        pass

    def constant_init(module, val, **kw):
        if hasattr(module, "weight") and module.weight is not None:
            tnn.init.constant_(module.weight, val)

    class NonLocal3d(tnn.Module):
        pass

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    runner = types.ModuleType("mmcv.runner")
    utils = types.ModuleType("mmcv.utils")
    cnn.ConvModule = _ConvModule
    cnn.kaiming_init = _noop
    cnn.constant_init = constant_init
    cnn.build_activation_layer = lambda cfg: tnn.ReLU()
    cnn.NonLocal3d = NonLocal3d
    cnn.MODELS = _Registry("models")
    cnn.CONV_LAYERS = _CONV_LAYERS
    cnn.build_norm_layer = _build_norm_layer
    runner._load_checkpoint = lambda *a, **k: {}
    runner.load_checkpoint = lambda *a, **k: {}
    utils.print_log = lambda *a, **k: None
    utils._BatchNorm = tnn.modules.batchnorm._BatchNorm
    utils.Registry = _Registry
    mmcv.cnn = cnn
    mmcv.runner = runner
    mmcv.utils = utils
    for name, mod in [
        ("mmcv", mmcv), ("mmcv.cnn", cnn), ("mmcv.runner", runner),
        ("mmcv.utils", utils),
    ]:
        sys.modules[name] = mod


class CfgNode(dict):
    """Attribute-access dict standing in for fvcore's CfgNode."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def merge_from_file(self, path):
        raise NotImplementedError("tests build configs programmatically")


def install_fvcore_stub():
    if "fvcore" in sys.modules:
        return
    fvcore = types.ModuleType("fvcore")
    fnn = types.ModuleType("fvcore.nn")
    winit = types.ModuleType("fvcore.nn.weight_init")
    common = types.ModuleType("fvcore.common")
    config = types.ModuleType("fvcore.common.config")
    winit.c2_msra_fill = lambda *a, **k: None
    winit.c2_xavier_fill = lambda *a, **k: None
    config.CfgNode = CfgNode
    fnn.weight_init = winit
    common.config = config
    fvcore.nn = fnn
    fvcore.common = common
    for name, mod in [
        ("fvcore", fvcore), ("fvcore.nn", fnn),
        ("fvcore.nn.weight_init", winit), ("fvcore.common", common),
        ("fvcore.common.config", config),
    ]:
        sys.modules[name] = mod


def load_ref_module(name, path):
    """Import a reference source file standalone under the given module name."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def randomize_torch_model(model, seed=0):
    """Random weights + plausible BN stats so parity actually exercises BN."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.2, 0.2, generator=g)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)
            elif name.endswith("running_mean"):
                b.uniform_(-0.2, 0.2, generator=g)
    model.eval()
    return model


def install_torchvision_stub():
    """Stub torchvision with the two surfaces reference code touches:
    models.vgg16 (the exact `features` Sequential layout, conv/relu/maxpool
    indices 0-30, no weight download) and utils.make_grid (identity — only
    called from logging paths the tests don't assert on). Idempotent: on a
    second call (or a partial stub installed by another test module in the
    same process) it fills in whatever submodule is missing instead of
    returning a stub that breaks `from torchvision import models`."""

    def vgg16(weights=None, pretrained=False, **kw):
        plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512]
        layers, in_ch = [], 3
        for v in plan:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(tnn.ReLU(inplace=True))
                in_ch = v
        layers.append(tnn.MaxPool2d(2, 2))

        class _VGG(tnn.Module):
            def __init__(self):
                super().__init__()
                self.features = tnn.Sequential(*layers)

        return _VGG()

    def submodule(name):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            # A sys.modules entry with __spec__=None makes
            # importlib.util.find_spec raise ValueError; transformers probes
            # torchvision that way on import.
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
        return mod

    tv = submodule("torchvision")
    models = submodule("torchvision.models")
    utils = submodule("torchvision.utils")
    if not hasattr(models, "vgg16"):
        models.vgg16 = vgg16
    if not hasattr(utils, "make_grid"):
        utils.make_grid = lambda *a, **k: a[0]
    tv.models = models
    tv.utils = utils
