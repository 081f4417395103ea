"""Regression tests for the code-review findings."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.data.loader import PrefetchLoader
from diff_foley_tpu.diffusion.samplers import dpm_solver_sample
from diff_foley_tpu.diffusion.schedule import DiffusionSchedule

SCHED = DiffusionSchedule.create(1000, linear_start=0.00085, linear_end=0.0120)


def test_loader_propagates_worker_exception():
    class BadDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise IOError("corrupt file")
            return {"x": np.zeros(2)}

    loader = PrefetchLoader(BadDataset(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="dataset worker failed"):
        for _ in loader.epoch(0):
            pass


def test_dpm_lower_order_final_low_steps_parity():
    """steps=10 < 15 exercises the lower_order_final path vs reference."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from diff_foley.models.diffusion.dpm_solver.dpm_solver import (
        DPM_Solver, NoiseScheduleVP, model_wrapper,
    )

    ac_np = np.asarray(SCHED.alphas_cumprod, dtype=np.float32)
    ns = NoiseScheduleVP("discrete", alphas_cumprod=torch.from_numpy(ac_np))

    def torch_model(x, t):
        return 0.4 * x + 0.002 * t.reshape(-1, 1, 1, 1)

    wrapped = model_wrapper(torch_model, ns, model_type="noise",
                            guidance_type="uncond")
    solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)
    x_T_np = np.random.default_rng(0).normal(size=(2, 1, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = solver.sample(
            torch.from_numpy(x_T_np), steps=10, skip_type="time_uniform",
            method="multistep", order=2, lower_order_final=True,
        ).numpy()

    def eps_fn(x, t_model, s_t):
        return 0.4 * x + 0.002 * t_model.reshape(-1, 1, 1, 1)

    out = dpm_solver_sample(eps_fn, SCHED,
                            jnp.asarray(x_T_np.transpose(0, 2, 3, 1)), steps=10)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=3e-4, atol=3e-4
    )


def test_native_and_python_readers_same_crops(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import io
    import shutil
    import tarfile

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from diff_foley_tpu.data.cavp_shards import iter_shards
    from diff_foley_tpu.data.native_loader import iter_shards_native

    rng = np.random.default_rng(0)
    shard = tmp_path / "s.tar"
    with tarfile.open(shard, "w") as tf:
        for k in range(4):
            spec = rng.uniform(size=(128, 640)).astype(np.float32)
            b = io.BytesIO()
            np.save(b, spec)
            info = tarfile.TarInfo(f"k{k}.spec.npy")
            info.size = b.getbuffer().nbytes
            b.seek(0)
            tf.addfile(info, b)
            strip = (rng.uniform(size=(224, 224 * 40, 3)) * 255).astype(np.uint8)
            ok, enc = cv2.imencode(".png", strip)  # lossless for bit-compare
            info = tarfile.TarInfo(f"k{k}.video.jpg")
            info.size = len(enc)
            tf.addfile(info, io.BytesIO(enc.tobytes()))

    py = {s["spec"].tobytes(): s for s in iter_shards([str(shard)], seed=5, epoch=2)}
    nat = {s["spec"].tobytes(): s for s in
           iter_shards_native([str(shard)], seed=5, epoch=2)}
    # same crops per sample regardless of reader/thread order
    assert set(py) == set(nat)


def test_pipeline_classifier_scale_without_classifier():
    from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.pipeline import (
        DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS,
    )

    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                        attention_resolutions=(2,), num_heads=4, context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        cond_embed_dim=24, cond_seq_len=WINDOW_FEATS,
    ))
    pipe = DiffFoleyPipeline(
        ldm, ldm.init_params(jax.random.PRNGKey(0)),
        ldm.init_vae_params(jax.random.PRNGKey(1)),
    )  # no classifier
    feats = np.zeros((WINDOW_FEATS, 512), np.float32)
    # default GenerationConfig keeps classifier_scale=50 — must not crash
    out = pipe.generate(
        feats, jax.random.PRNGKey(2),
        GenerationConfig(steps=2, sample_num=1, gl_iters=2),
    )
    assert np.isfinite(out["wav"]).all()
