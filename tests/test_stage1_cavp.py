"""Stage-1 CAVP: contrastive losses, trainer step, retrieval metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.models.cavp.cavp import CAVPConfig, CAVPModel
from diff_foley_tpu.train.losses import (
    clip_loss,
    intra_contrast_loss,
    retrieval_metrics,
    temporal_semantic_loss,
)
from diff_foley_tpu.train.stage1_cavp import (
    Stage1TrainConfig,
    init_train_state,
    make_train_step,
    LOG_100,
)


def _feats(key, n, d=16):
    x = jax.random.normal(key, (n, d))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def test_clip_loss_perfect_alignment_low():
    v = _feats(jax.random.PRNGKey(0), 12)
    loss_aligned = float(clip_loss(v, v, jnp.asarray(100.0)))
    s = _feats(jax.random.PRNGKey(1), 12)
    loss_random = float(clip_loss(v, s, jnp.asarray(100.0)))
    assert loss_aligned < 0.01
    assert loss_random > 1.0


def test_intra_contrast_matches_torch_reference_math():
    """Cross-check the block-diagonal slicing against a torch replica."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    bs, clip_num = 12, 3
    v = rng.normal(size=(bs, 8)).astype(np.float32)
    s = rng.normal(size=(bs, 8)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    scale = 30.0

    out = intra_contrast_loss(
        jnp.asarray(v), jnp.asarray(s), jnp.asarray(scale), clip_num=clip_num
    )

    tv, tsp = torch.from_numpy(v), torch.from_numpy(s)
    lv = scale * tv @ tsp.T
    ls = lv.T
    labels = torch.arange(bs)
    extra = (F.cross_entropy(lv, labels) + F.cross_entropy(ls, labels)) / 2
    nb = bs // clip_num
    sel = (range(nb), np.s_[:], range(nb), np.s_[:])
    bv = lv.reshape(nb, clip_num, nb, clip_num)[sel].reshape(-1, clip_num)
    bsp = ls.reshape(nb, clip_num, nb, clip_num)[sel].reshape(-1, clip_num)
    li = torch.arange(clip_num).unsqueeze(0).repeat(nb, 1).reshape(-1)
    intra = (F.cross_entropy(bv, li) + F.cross_entropy(bsp, li)) / 2

    np.testing.assert_allclose(
        float(out["extra_contrast_loss"]), float(extra), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out["intra_contrast_loss"]), float(intra), rtol=1e-5
    )


def test_temporal_semantic_loss_shapes():
    key = jax.random.PRNGKey(0)
    v = _feats(key, 4)
    s = _feats(jax.random.PRNGKey(1), 4)
    vt = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 16))
    st = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 16))
    out = temporal_semantic_loss(v, s, vt, st, jnp.asarray(10.0))
    assert np.isfinite(float(out["total_loss"]))


def test_retrieval_metrics_perfect():
    v = _feats(jax.random.PRNGKey(0), 20)
    m = retrieval_metrics(v, v)
    assert float(m["video_to_spec_R@1"]) == 1.0
    assert float(m["video_to_spec_mean_rank"]) == 1.0


@pytest.mark.slow
def test_cavp_train_step_runs_and_improves():
    model = CAVPModel(CAVPConfig(embed_dim=32))
    cfg = Stage1TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100, clip_num=2)
    # real clip geometry: 16 frames (4 s @ 4 FPS), 256 spec frames — the
    # MaxPool1d(16) heads need exactly these (model.py:496-501)
    state = init_train_state(
        model, jax.random.PRNGKey(0), cfg,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    )
    step = jax.jit(make_train_step(model, cfg))
    # batch: 2 videos × 2 clips
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(size=(2, 2, 16, 16, 16, 3)), jnp.float32),
        "spec": jnp.asarray(rng.normal(size=(2, 2, 128, 256)), jnp.float32),
    }
    losses = []
    for i in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert float(m["grad_norm"]) > 0
    assert float(state.params["logit_scale"]) <= LOG_100 + 1e-6
    # batch_stats must have been updated
    flat = jax.tree.leaves(state.batch_stats)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_forward_temporal_pairs():
    """CLIP_Video_Spec_Temporal forward surface: temporal + mean pairs feed
    temporal_semantic_loss directly."""
    import jax
    import jax.numpy as jnp

    from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.train.losses import temporal_semantic_loss

    model = CAVPModel(CAVPConfig())
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 3)), jnp.float32)
    spec = jnp.asarray(rng.normal(size=(2, 128, 256)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, spec)
    out = model.apply(
        variables, video, spec,
        method=lambda m, v, s: m.forward_temporal(v, s),
    )
    assert out["video_temporal_features"].shape == (2, 16, 512)
    assert out["spec_temporal_features"].shape == (2, 16, 512)
    assert out["video_mean_features"].shape == (2, 512)
    losses = temporal_semantic_loss(
        out["video_mean_features"], out["spec_mean_features"],
        out["video_temporal_features"], out["spec_temporal_features"],
        out["logit_scale"],
    )
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.slow
def test_cavp_train_step_mixed_precision_bf16():
    """compute_dtype="bfloat16": bf16 tower compute against fp32 masters —
    the TPU replacement for open_clip's --precision amp (SURVEY.md §2.8).
    Masters and BN running stats stay fp32, logit_scale stays fp32, and the
    step-0 loss agrees with the fp32 trainer to bf16 tolerance."""
    model = CAVPModel(CAVPConfig(embed_dim=32))
    cfg32 = Stage1TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                              clip_num=2)
    cfg16 = Stage1TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                              clip_num=2, compute_dtype="bfloat16")
    state = init_train_state(
        model, jax.random.PRNGKey(0), cfg16,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    )
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(size=(2, 2, 16, 16, 16, 3)),
                             jnp.float32),
        "spec": jnp.asarray(rng.normal(size=(2, 2, 128, 256)), jnp.float32),
    }
    step16 = jax.jit(make_train_step(model, cfg16))
    step32 = jax.jit(make_train_step(model, cfg32))
    _, m16 = step16(state, batch, jax.random.PRNGKey(1))
    _, m32 = step32(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m16["total_loss"]),
                               float(m32["total_loss"]), rtol=0.05)

    losses = []
    for i in range(3):
        state, m = step16(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    # masters, BN stats, logit_scale: all fp32
    for leaf in jax.tree.leaves(state.params) + jax.tree.leaves(
        state.batch_stats
    ):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    assert state.params["logit_scale"].dtype == jnp.float32


def test_cavp_mixed_precision_rejects_alt_towers():
    import flax

    model = CAVPModel(CAVPConfig(embed_dim=32, video_arch="x3d",
                                 dtype="bfloat16"))
    with pytest.raises((ValueError, flax.errors.FlaxError),
                       match="only supported"):
        model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, 16, 3)), jnp.zeros((1, 128, 256)),
                   train=False)


def test_uint8_video_link_path_matches_float():
    """CAVPShardConfig.uint8_video: decode emits raw uint8 and the train
    step divides by 255 on device — loss and gradients identical to the
    host-float path (same /255 in fp32, just after the transfer)."""
    import io

    import cv2

    from diff_foley_tpu.data.cavp_shards import CAVPShardConfig, decode_sample

    rng = np.random.default_rng(3)
    spec = rng.uniform(0, 1, (128, 640)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, spec)
    strip = (rng.uniform(size=(16, 16 * 40, 3)) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".png", strip[:, :, ::-1])  # png: lossless
    assert ok
    sample_rng = lambda: np.random.default_rng(7)  # noqa: E731

    f32 = decode_sample(buf.getvalue(), enc.tobytes(), sample_rng(),
                        CAVPShardConfig(clip_num=2))
    u8 = decode_sample(buf.getvalue(), enc.tobytes(), sample_rng(),
                       CAVPShardConfig(clip_num=2, uint8_video=True))
    assert u8["video"].dtype == np.uint8
    np.testing.assert_array_equal(
        f32["video"], u8["video"].astype(np.float32) / 255.0)

    model = CAVPModel(CAVPConfig(embed_dim=32))
    cfg = Stage1TrainConfig(lr=1e-3, warmup_steps=1, total_steps=100,
                            clip_num=2)
    state0 = init_train_state(
        model, jax.random.PRNGKey(0), cfg,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    )
    step = jax.jit(make_train_step(model, cfg))
    vid_u8 = (np.random.default_rng(5).uniform(
        size=(2, 2, 16, 16, 16, 3)) * 255).astype(np.uint8)
    spec_b = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 2, 128, 256)), jnp.float32)
    _, m_f = step(state0, {"video": jnp.asarray(
        vid_u8.astype(np.float32) / 255.0), "spec": spec_b},
        jax.random.PRNGKey(1))
    _, m_u = step(state0, {"video": jnp.asarray(vid_u8), "spec": spec_b},
                  jax.random.PRNGKey(1))
    # not bitwise: XLA fuses the on-device /255 into the first conv and
    # reassociates; agreement is to fp32 fusion tolerance
    np.testing.assert_allclose(float(m_f["total_loss"]),
                               float(m_u["total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_f["grad_norm"]),
                               float(m_u["grad_norm"]), rtol=1e-3)
