"""Real-video path: ingest frame selection vs ffmpeg fps semantics, plus the
user-facing DiffFoley API end-to-end over a reference demo video.

Spec: inference/demo_util.py:31-173 (Extract_CAVP_Features) — ffmpeg
re-encodes to fps=4 then every frame is used; our ingest instead selects
source frame round(t_out * src_fps) per output timestamp, which is ffmpeg's
`fps` filter (round=near) behaviour for CFR input.
"""
import os

import cv2
import jax
import numpy as np
import pytest

from diff_foley_tpu.video.ingest import extract_frames

DEMO = "/root/reference/inference/demo_videos/gun.mp4"


def _write_synthetic(path, n_frames=60, fps=30.0, step=4):
    """CFR clip where frame i is a solid gray level i*step (MJPG ≈ lossless
    enough to recover the index by rounding the mean)."""
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (64, 64))
    assert w.isOpened()
    for i in range(n_frames):
        w.write(np.full((64, 64, 3), i * step, np.uint8))
    w.release()


def _decode_indices(frames, step=4):
    return [int(round(f.mean() * 255.0 / step)) for f in frames]


def test_frame_selection_matches_ffmpeg_fps(tmp_path):
    p = str(tmp_path / "synth.avi")
    _write_synthetic(p)  # 60 frames @30fps = 2.0 s
    frames = extract_frames(p, fps=4.0, size=32)
    # ffmpeg fps=4 on CFR 30fps: output frame k ← source round(k * 30/4)
    expect = [int(round(k * 30 / 4)) for k in range(8)]
    assert frames.shape == (8, 32, 32, 3)
    assert frames.dtype == np.float32 and frames.max() <= 1.0
    assert _decode_indices(frames) == expect


def test_frame_selection_start_and_truncate(tmp_path):
    p = str(tmp_path / "synth.avi")
    _write_synthetic(p)
    frames = extract_frames(
        p, fps=4.0, size=32, start_second=0.5, truncate_second=1.0
    )
    expect = [int(round((0.5 + k / 4) * 30)) for k in range(4)]
    assert frames.shape[0] == 4
    assert _decode_indices(frames) == expect


@pytest.fixture(scope="module")
def tiny_diff_foley():
    from diff_foley_tpu.api import DiffFoley
    from diff_foley_tpu.diffusion.latent_diffusion import (
        LatentDiffusion,
        LDMConfig,
    )
    from diff_foley_tpu.models.cavp import CAVPModel
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig

    cfg = LDMConfig(
        unet=UNetConfig(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(2,), num_heads=4, context_dim=64,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
        cond_embed_dim=64,
        cond_seq_len=32,
    )
    ldm = LatentDiffusion(cfg)
    params = ldm.init_params(jax.random.PRNGKey(0))
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    cavp = CAVPModel()
    import jax.numpy as jnp

    cavp_vars = cavp.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 4, 64, 64, 3)),
        method=lambda m, v: m.encode_video(v, normalize=True, pool=False),
    )
    return DiffFoley(
        ldm, params, vae_params, cavp, cavp_vars,
        classifier=None, bf16=False, frame_size=64,
    )


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo video absent")
def test_generate_for_video_end_to_end(tiny_diff_foley):
    from diff_foley_tpu.pipeline import GenerationConfig, WINDOW_SAMPLES

    gen = GenerationConfig(
        steps=3, sample_num=1, classifier_scale=0.0, gl_iters=2
    )
    out = tiny_diff_foley.generate_for_video(
        DEMO, seed=21, gen=gen, truncate_second=8.2
    )
    assert out["wav"].shape == (1, WINDOW_SAMPLES)
    assert np.isfinite(out["wav"]).all()
    assert out["spec"].shape == (1, 128, 512)
    assert np.isfinite(out["spec"]).all()


@pytest.mark.skipif(not os.path.exists(DEMO), reason="demo video absent")
def test_serving_generate_video_route(tiny_diff_foley):
    import http.client

    from diff_foley_tpu.pipeline import (
        DiffFoleyPipeline,
        GenerationConfig,
        WINDOW_SAMPLES,
    )
    from diff_foley_tpu.serving import BatchingEngine, FoleyServer

    df = tiny_diff_foley
    engine = BatchingEngine(
        df.pipe,
        gen=GenerationConfig(
            steps=3, sample_num=1, classifier_scale=0.0, gl_iters=2,
            return_spec=False,
        ),
        max_wait_ms=1.0,
    )
    server = FoleyServer(engine, port=0, feature_fn=df.extract_features)
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
        with open(DEMO, "rb") as f:
            body = f.read()
        conn.request(
            "POST", "/generate_video", body,
            {"Content-Type": "video/mp4", "Content-Length": str(len(body))},
        )
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:200]
        import json

        payload = json.loads(resp.read())
        assert payload["sr"] == 16000
        # gun.mp4 is ~2 min; features give many windows — at least one
        assert payload["num_samples"] % WINDOW_SAMPLES == 0
        assert payload["num_samples"] >= WINDOW_SAMPLES
    finally:
        server.shutdown()
        engine.stop()
