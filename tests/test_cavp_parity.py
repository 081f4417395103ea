"""CAVP tower parity vs the reference torch modules (mmcv stubbed)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


from ref_stubs import install_mmcv_stub as _install_mmcv_stub  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    _install_mmcv_stub()
    sys.path.insert(0, "/root/reference/inference")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cavp_modules", "/root/reference/inference/model/cavp_modules.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cnn14_parity(ref_modules):
    from diff_foley_tpu.models.cavp.cnn14 import Cnn14
    from diff_foley_tpu.utils.convert import convert_cnn14

    tm = ref_modules.Cnn14(embed_dim=512).eval()
    rng = np.random.default_rng(0)
    # (B, 1, T, Mel) torch input; T=64 spec frames
    x = rng.normal(size=(2, 1, 64, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, T/16, 512)

    variables = jax.tree.map(jnp.asarray, convert_cnn14(tm.state_dict()))
    # my layout: (B, T, M, 1)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = Cnn14(embed_dim=512).apply(variables, xj, train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_slowonly_parity(ref_modules):
    from diff_foley_tpu.models.cavp.slowonly import ResNet3dSlowOnly
    from diff_foley_tpu.utils.convert import convert_slowonly

    tm = ref_modules.ResNet3dSlowOnly(depth=50, pretrained=None)
    tm.eval()
    rng = np.random.default_rng(1)
    # small input: (B, C, T, H, W) = (1, 3, 4, 64, 64)
    x = rng.normal(size=(1, 3, 4, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))  # (B, 2048, T, 1, 1)
        ref = ref.squeeze(-1).squeeze(-1).permute(0, 2, 1).numpy()  # (B,T,C)

    variables = jax.tree.map(jnp.asarray, convert_slowonly(tm.state_dict()))
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NDHWC
    out = ResNet3dSlowOnly().apply(variables, xj, train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_cavp_model_full_parity(ref_modules):
    from diff_foley_tpu.models.cavp.cavp import CAVPModel
    from diff_foley_tpu.utils.convert import convert_cavp

    tm = ref_modules.__dict__
    CAVP_Inference_src = None
    # build the full inference model from cavp_model.py (imports cavp_modules
    # relatively; construct manually instead)
    import torch.nn as tnn

    class TorchCAVP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.video_encoder = ref_modules.ResNet3dSlowOnly(
                depth=50, pretrained=None
            )
            self.video_project_head = tnn.Linear(2048, 512)
            self.spec_encoder = ref_modules.Cnn14(embed_dim=512)
            self.logit_scale = tnn.Parameter(
                torch.ones([]) * np.log(1 / 0.07)
            )

    tmodel = TorchCAVP().eval()
    rng = np.random.default_rng(2)
    video = rng.normal(size=(1, 4, 64, 64, 3)).astype(np.float32)  # B,T,H,W,C
    spec = rng.normal(size=(1, 128, 64)).astype(np.float32)

    with torch.no_grad():
        v = torch.from_numpy(video.transpose(0, 4, 1, 2, 3))  # B,C,T,H,W
        vf = tmodel.video_encoder(v).squeeze(-1).squeeze(-1).permute(0, 2, 1)
        vf = tmodel.video_project_head(vf)  # (B, T, 512) per-frame
        sf = tmodel.spec_encoder(
            torch.from_numpy(spec).unsqueeze(1).permute(0, 1, 3, 2)
        )

    variables = jax.tree.map(jnp.asarray, convert_cavp(tmodel.state_dict()))
    model = CAVPModel()
    vj = model.apply(
        variables, jnp.asarray(video),
        method=lambda m, a: m.encode_video(a, pool=False),
    )
    np.testing.assert_allclose(np.asarray(vj), vf.numpy(), rtol=1e-3, atol=1e-3)
    sj = model.apply(
        variables, jnp.asarray(spec),
        method=lambda m, a: m.encode_spec(a, pool=False),
    )
    np.testing.assert_allclose(np.asarray(sj), sf.numpy(), rtol=1e-4, atol=1e-4)


def test_cavp_export_loads_into_reference_model(ref_modules):
    """The exported state dict must load into the reference torch CAVP with
    strict=True (exact key/shape match, incl. BN buffers) and produce the
    same features the jax model does — the stage-1 checkpoint door works in
    the jax→torch direction (layout: open_clip/model.py:457-671)."""
    from diff_foley_tpu.models.cavp.cavp import CAVPModel
    from diff_foley_tpu.utils.convert import export_cavp

    import torch.nn as tnn

    class TorchCAVP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.video_encoder = ref_modules.ResNet3dSlowOnly(
                depth=50, pretrained=None
            )
            self.video_project_head = tnn.Linear(2048, 512)
            self.spec_encoder = ref_modules.Cnn14(embed_dim=512)
            self.logit_scale = tnn.Parameter(
                torch.ones([]) * np.log(1 / 0.07)
            )

    model = CAVPModel()
    variables = model.init(
        jax.random.PRNGKey(11),
        jnp.zeros((1, 4, 32, 32, 3)),
        jnp.zeros((1, 128, 64)),
        train=False,
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_cavp(variables).items()}

    tmodel = TorchCAVP().eval()
    missing, unexpected = tmodel.load_state_dict(sd, strict=True), None
    rng = np.random.default_rng(5)
    video = rng.normal(size=(1, 4, 64, 64, 3)).astype(np.float32)
    spec = rng.normal(size=(1, 128, 64)).astype(np.float32)

    with torch.no_grad():
        v = torch.from_numpy(video.transpose(0, 4, 1, 2, 3))
        vf = tmodel.video_encoder(v).squeeze(-1).squeeze(-1).permute(0, 2, 1)
        vf = tmodel.video_project_head(vf)
        sf = tmodel.spec_encoder(
            torch.from_numpy(spec).unsqueeze(1).permute(0, 1, 3, 2)
        )

    vj = model.apply(
        variables, jnp.asarray(video),
        method=lambda m, a: m.encode_video(a, pool=False),
    )
    np.testing.assert_allclose(np.asarray(vj), vf.numpy(), rtol=1e-3, atol=1e-3)
    sj = model.apply(
        variables, jnp.asarray(spec),
        method=lambda m, a: m.encode_spec(a, pool=False),
    )
    np.testing.assert_allclose(np.asarray(sj), sf.numpy(), rtol=1e-3, atol=1e-3)
