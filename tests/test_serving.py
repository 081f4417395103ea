"""Serving layer: batching engine + HTTP server end-to-end on tiny models."""
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.models.unet import UNetConfig
from diff_foley_tpu.models.vae import VAEConfig
from diff_foley_tpu.pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS
from diff_foley_tpu.serving import BatchingEngine, FoleyServer

TINY = LDMConfig(
    unet=UNetConfig(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                    attention_resolutions=(2,), num_heads=4, context_dim=24),
    vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    cond_embed_dim=24, cond_seq_len=WINDOW_FEATS,
)


@pytest.fixture(scope="module")
def engine():
    ldm = LatentDiffusion(TINY)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    pipe = DiffFoleyPipeline(ldm, params, vae_params)
    eng = BatchingEngine(
        pipe,
        GenerationConfig(steps=2, sample_num=1, gl_iters=2,
                         classifier_scale=0.0, return_spec=False),
        max_batch_windows=4, max_wait_ms=50,
    )
    yield eng
    eng.stop()


def test_engine_single_and_concurrent(engine):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(WINDOW_FEATS, 512)).astype(np.float32)
    wav = engine.submit(feats)
    assert wav.shape == (131072,)
    assert np.isfinite(wav).all()

    # concurrent requests get batched together and each gets its own window
    results = {}

    def worker(i):
        f = rng.normal(size=(WINDOW_FEATS * (1 + i % 2), 512)).astype(np.float32)
        results[i] = engine.submit(f)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1, 2}
    assert results[1].shape == (2 * 131072,)


def test_http_server(engine):
    server = FoleyServer(engine, port=0)
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            assert json.loads(r.read())["status"] == "ok"

        feats = np.zeros((WINDOW_FEATS, 512), np.float32).tolist()
        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"features": feats}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert payload["sr"] == 16000
        assert payload["num_samples"] == 131072

        # malformed: wrong feature dim
        bad = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"features": [[1.0, 2.0]]}).encode(),
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_engine_and_http_continue_audio(engine):
    """Audio continuation through serving: the engine's masked-generation
    path and the /continue HTTP route (known mel prefix kept, rest
    regenerated)."""
    from diff_foley_tpu.pipeline import SPEC_HW

    rng = np.random.default_rng(2)
    feats = rng.normal(size=(WINDOW_FEATS, 512)).astype(np.float32)
    spec = rng.uniform(0.0, 1.0, size=(SPEC_HW[0], 128)).astype(np.float32)

    wav = engine.continue_audio(feats, spec, known_seconds=2.0)
    assert wav.shape == (131072,)
    assert np.isfinite(np.asarray(wav, np.float32)).all()

    server = FoleyServer(engine, port=0)
    server.start_background()
    base = f"http://127.0.0.1:{server.port}"
    try:
        req = urllib.request.Request(
            f"{base}/continue",
            data=json.dumps({
                "features": feats.tolist(),
                "known_spec": spec.tolist(),
                "known_seconds": 2.0,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert payload["sr"] == 16000
        assert payload["num_samples"] == 131072

        # missing known source → 400
        bad = urllib.request.Request(
            f"{base}/continue",
            data=json.dumps({"features": feats.tolist(),
                             "known_seconds": 2.0}).encode(),
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_engine_oversize_request_uses_fixed_buckets(engine):
    """Round-2 review: a request larger than max_batch_windows must be
    chunked through the fixed bucket program (bounded shapes), and the
    output must cover exactly the requested windows."""
    rng = np.random.default_rng(1)
    w = 7  # > max_batch_windows=4 and not a multiple of it
    feats = rng.normal(size=(w * WINDOW_FEATS, 512)).astype(np.float32)
    wav = engine.submit(feats, timeout=300)
    assert wav.shape == (w * 131072,)
    assert np.isfinite(wav).all()
