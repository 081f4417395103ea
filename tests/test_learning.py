"""Functional learning gates (round-3 VERDICT weak #1 / next #1).

Numerical parity proves the rebuilt machine computes the reference's
function; these tests prove it can LEARN — on the deterministic synthetic
audio-visual world of `data/synthetic.py`, where cross-modal identity is a
class value c (spec band row ↔ video bar column ↔ feature embedding) and
within-item time is an amplitude envelope phase.

Gates asserted here (CPU-budget scale; the committed QUALITY_r04.json
artifact runs the larger composed gate on the real TPU):

- stage-1 CAVP contrastive training reaches held-out retrieval R@1 far
  above chance (a loss wired to the wrong labels/sign would pin this at
  chance — exactly the failure class parity tests cannot catch);
- the synthetic world itself is honest: an UNTRAINED tower scores at
  chance (the gate cannot pass vacuously).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_foley_tpu.data.cavp_shards import CAVPShardConfig, iter_shards
from diff_foley_tpu.data.synthetic import holdout_pairs, write_cavp_shards
from diff_foley_tpu.models.cavp import CAVPConfig, CAVPModel
from diff_foley_tpu.train.losses import retrieval_metrics
from diff_foley_tpu.train.stage1_cavp import (
    Stage1TrainConfig,
    init_train_state,
    make_train_step,
)

pytestmark = pytest.mark.slow

N_HOLDOUT = 16
CHANCE = 1.0 / N_HOLDOUT


def _tiny_cavp():
    return CAVPModel(CAVPConfig(
        video_stage_blocks=(1, 1, 1, 1), video_base_channels=16,
        spec_channels=(8, 8, 8, 8, 8, 8),
    ))


def _holdout_features(model, state):
    ho = holdout_pairs(N_HOLDOUT, seed=9000)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vf = model.apply(
        variables, jnp.asarray(ho["video"][:, :16]),
        method=lambda m, a: m.encode_video(
            a, normalize=True, pool=True, train=False),
    )
    sf = model.apply(
        variables, jnp.asarray(ho["spec"][:, :, :256]),
        method=lambda m, a: m.encode_spec(
            a, normalize=True, pool=True, train=False),
    )
    return retrieval_metrics(vf, sf)


def test_cavp_contrastive_training_learns_retrieval(tmp_path):
    """250 steps of intra-contrast training on the synthetic world lift
    held-out retrieval far above chance (mean-R@1 measured ≈5-9× chance at
    this budget across platforms); the untrained towers sit at chance on
    the same gallery, so the gate cannot pass vacuously."""
    pytest.importorskip("cv2")
    shard_dir = str(tmp_path / "shards")
    write_cavp_shards(shard_dir, n_shards=4, items_per_shard=16, seed=0)
    shards = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.endswith(".tar")
    )

    model = _tiny_cavp()
    clip = 2
    tcfg = Stage1TrainConfig(
        lr=8e-4, warmup_steps=20, total_steps=400, clip_num=clip
    )
    state = init_train_state(
        model, jax.random.PRNGKey(0), tcfg,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    )

    # honesty gate: untrained towers score ~chance on the held-out gallery
    m0 = _holdout_features(model, state)
    r1_untrained = 0.5 * (
        float(m0["video_to_spec_R@1"]) + float(m0["spec_to_video_R@1"])
    )
    assert r1_untrained <= 4 * CHANCE, (
        f"untrained R@1 {r1_untrained} — the world leaks trivially"
    )

    step_fn = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    scfg = CAVPShardConfig(clip_num=clip, shift_lb=8)
    first_loss = last_loss = None
    step = 0
    for epoch in range(100):
        buf_v, buf_s = [], []
        for sample in iter_shards(shards, seed=0, epoch=epoch, cfg=scfg):
            buf_v.append(sample["video"])
            buf_s.append(sample["spec"])
            if len(buf_v) == 8:
                batch = {
                    "video": jnp.asarray(np.stack(buf_v)),
                    "spec": jnp.asarray(np.stack(buf_s)),
                }
                buf_v, buf_s = [], []
                state, metrics = step_fn(state, batch, rng)
                step += 1
                if first_loss is None:
                    first_loss = float(metrics["total_loss"])
                last_loss = float(metrics["total_loss"])
            if step >= 250:
                break
        if step >= 250:
            break

    assert last_loss < first_loss, (first_loss, last_loss)
    m = _holdout_features(model, state)
    r1_v2s = float(m["video_to_spec_R@1"])
    r1_s2v = float(m["spec_to_video_R@1"])
    # run-to-run variance at this budget is real (tiny towers, 150-250
    # steps): each direction measured 0.19-0.56 across platforms/seeds.
    # Gate: mean ≥4× chance AND each direction ≥2.5× chance.
    assert 0.5 * (r1_v2s + r1_s2v) >= 4 * CHANCE, (r1_v2s, r1_s2v)
    assert min(r1_v2s, r1_s2v) >= 2.5 * CHANCE, (r1_v2s, r1_s2v)
    assert float(m["video_to_spec_R@5"]) >= 0.5
