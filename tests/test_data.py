"""Data pipelines: stage-2 dataset semantics, loader sharding, CAVP shards."""
import io
import os
import tarfile

import numpy as np
import pytest

from diff_foley_tpu.data.cavp_shards import (
    CAVPShardConfig,
    decode_sample,
    iter_shards,
    sample_temporal_index,
)
from diff_foley_tpu.data.ldm_dataset import LDMDataConfig, SpecFeatDataset
from diff_foley_tpu.data.loader import PrefetchLoader, shard_indices


@pytest.fixture()
def dataset(tmp_path):
    paths_s, paths_f = [], []
    rng = np.random.default_rng(0)
    for i in range(6):
        spec = rng.uniform(size=(128, 300 + 100 * i)).astype(np.float32)
        feat = rng.normal(size=(20 + 5 * i, 512)).astype(np.float32)
        sp = tmp_path / f"{i}_mel.npy"
        fp = tmp_path / f"{i}.npz"
        np.save(sp, spec)
        np.savez(fp, feat=feat)
        paths_s.append(str(sp))
        paths_f.append(str(fp))
    return SpecFeatDataset(paths_s, paths_f, LDMDataConfig(), seed=1)


def test_ldm_dataset_shapes(dataset):
    for i in range(len(dataset)):
        d = dataset[i]
        assert d["spec"].shape == (128, 512, 3)
        assert d["video_feat"].shape == (32, 512)
        # 3-channel tiling is an exact repeat
        np.testing.assert_array_equal(d["spec"][..., 0], d["spec"][..., 1])


def test_ldm_dataset_alignment_labels(tmp_path, dataset):
    ds = SpecFeatDataset(
        dataset.spec_paths, dataset.feat_paths, LDMDataConfig(),
        alignment_labels=True, seed=2,
    )
    labels = [int(ds[i % len(ds)]["labels"]) for i in range(20)]
    assert set(labels) == {0, 1}


def test_shard_indices_disjoint_and_deterministic():
    a0 = shard_indices(100, 8, process_index=0, process_count=4, seed=3, epoch=1)
    a1 = shard_indices(100, 8, process_index=1, process_count=4, seed=3, epoch=1)
    assert len(set(a0) & set(a1)) == 0
    assert len(a0) == 24  # 25 per host, dropped to batch multiple
    b0 = shard_indices(100, 8, process_index=0, process_count=4, seed=3, epoch=1)
    np.testing.assert_array_equal(a0, b0)
    c0 = shard_indices(100, 8, process_index=0, process_count=4, seed=3, epoch=2)
    assert not np.array_equal(a0, c0)


def test_prefetch_loader_order_and_shapes(dataset):
    loader = PrefetchLoader(dataset, batch_size=2, num_workers=3)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["spec"].shape == (2, 128, 512, 3)
        assert b["video_feat"].shape == (2, 32, 512)


def test_sample_temporal_index_constraints():
    cfg = CAVPShardConfig(clip_num=3, shift_lb=8)
    rng = np.random.default_rng(0)
    for _ in range(200):
        starts = sample_temporal_index(rng, cfg)
        assert len(starts) == 3
        for a, b in zip(starts, starts[1:]):
            assert b - a >= cfg.shift_lb
        assert starts[-1] + 16 <= cfg.video_len


def test_cavp_shard_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    # build a tiny shard: 3 samples of 40-frame strips + (128, 640) specs
    shard = tmp_path / "shard-000000.tar"
    with tarfile.open(shard, "w") as tf:
        for k in range(3):
            spec = rng.uniform(size=(128, 640)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, spec)
            info = tarfile.TarInfo(f"sample{k}.spec.npy")
            info.size = buf.getbuffer().nbytes
            buf.seek(0)
            tf.addfile(info, buf)

            strip = (rng.uniform(size=(224, 224 * 40, 3)) * 255).astype(np.uint8)
            ok, enc = cv2.imencode(".jpg", strip)
            assert ok
            jb = io.BytesIO(enc.tobytes())
            info = tarfile.TarInfo(f"sample{k}.video.jpg")
            info.size = len(enc)
            tf.addfile(info, jb)

    samples = list(iter_shards([str(shard)], seed=0, epoch=0))
    assert len(samples) == 3
    for s in samples:
        assert s["video"].shape == (3, 16, 224, 224, 3)
        assert s["spec"].shape == (3, 128, 256)
        assert 0.0 <= s["video"].min() and s["video"].max() <= 1.0


def test_prefetch_loader_early_break_joins_workers(dataset):
    """Round-2 review: abandoning epoch() mid-iteration (the val-loop
    pattern) must not leak blocked worker threads."""
    import threading

    from diff_foley_tpu.data.loader import PrefetchLoader

    before = threading.active_count()
    loader = PrefetchLoader(dataset, batch_size=2, num_workers=3, prefetch=1)
    for _ in range(3):
        for _b in loader.epoch(0):
            break  # abandon immediately with full queues
    # generator finalizer sets stop and joins; no thread growth
    import time

    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_prefetch_loader_bounded_with_slow_head(dataset):
    """Round-2 review: one slow head-of-line batch must not let workers
    buffer the whole epoch (results dict is bounded by the window)."""
    import threading
    import time

    from diff_foley_tpu.data.loader import PrefetchLoader

    produced = []
    gate = threading.Event()

    class SlowHead:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            if i == 0:
                gate.wait(5)
            produced.append(i)
            return {"x": np.zeros(2)}

    loader = PrefetchLoader(SlowHead(), batch_size=2, num_workers=4,
                            prefetch=2)
    it = loader.epoch(0)
    time.sleep(1.0)  # workers run while batch 0 is gated
    # window = prefetch + num_workers = 6 batches = 12 samples max ahead
    assert len(produced) <= 14, f"ran ahead unbounded: {len(produced)}"
    gate.set()
    batches = list(it)
    assert len(batches) == 32


def test_untiled_spec_path_matches_host_tiled():
    """tile_channels=False sends (128,T) specs; the train step tiles x3 on
    device — must be numerically identical to the host-tiled batch (the
    host→device transfer optimisation cannot change training)."""
    import jax
    import jax.numpy as jnp
    from diff_foley_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LDMConfig,
    )
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.train.stage2_ldm import (
        Stage2TrainConfig, init_train_state, make_train_step,
    )

    cfg = LDMConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(2,),
                        num_heads=4, context_dim=24),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        cond_embed_dim=24, cond_seq_len=8,
    )
    ldm = LatentDiffusion(cfg)
    tcfg = Stage2TrainConfig(use_ema=False)
    state = init_train_state(ldm, jax.random.PRNGKey(0), tcfg)
    vae_params = ldm.init_vae_params(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)
    spec1 = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 64))
    feat = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 512))
    step = jax.jit(make_train_step(ldm, tcfg))

    _, m3 = step(state, vae_params, {"spec": spec1, "video_feat": feat}, rng)
    tiled = jnp.repeat(spec1[..., None], 3, axis=-1)
    _, m4 = step(state, vae_params, {"spec": tiled, "video_feat": feat}, rng)
    assert float(m3["loss"]) == float(m4["loss"])


def test_dataset_tile_channels_flag():
    import numpy as np
    from diff_foley_tpu.data.ldm_dataset import LDMDataConfig, SpecFeatDataset

    rng = np.random.default_rng(0)
    import tempfile, os
    d = tempfile.mkdtemp()
    sp, fp = [], []
    for i in range(2):
        s = os.path.join(d, f"{i}_mel.npy")
        f = os.path.join(d, f"{i}.npz")
        np.save(s, rng.uniform(size=(128, 625)).astype(np.float32))
        np.savez(f, feat=rng.normal(size=(40, 512)).astype(np.float32))
        sp.append(s); fp.append(f)
    ds3 = SpecFeatDataset(sp, fp, LDMDataConfig(tile_channels=False))
    ds4 = SpecFeatDataset(sp, fp, LDMDataConfig())
    a, b = ds3[0], ds4[0]
    assert a["spec"].ndim == 2 and b["spec"].ndim == 3
    np.testing.assert_array_equal(np.repeat(a["spec"][:, :, None], 3, 2),
                                  b["spec"])


def test_device_prefetcher_stages_and_casts(dataset):
    """DevicePrefetcher: batches land on device in order, fp32 leaves cast
    to the requested dtype host-side, non-fp32 leaves untouched."""
    import jax
    import jax.numpy as jnp

    from diff_foley_tpu.data.loader import DevicePrefetcher, PrefetchLoader

    loader = PrefetchLoader(dataset, batch_size=2, num_workers=2)
    plain = list(loader.epoch(0))
    staged = list(DevicePrefetcher(loader.epoch(0), cast_dtype="bfloat16"))
    assert len(staged) == len(plain) > 0
    for ref, got in zip(plain, staged):
        for k in ref:
            assert isinstance(got[k], jax.Array), type(got[k])
            if ref[k].dtype == np.float32:
                assert got[k].dtype == jnp.bfloat16
                np.testing.assert_allclose(
                    np.asarray(got[k], dtype=np.float32), ref[k],
                    rtol=8e-3, atol=8e-3,
                )
            else:
                assert got[k].dtype == ref[k].dtype


def test_device_prefetcher_propagates_worker_errors():
    from diff_foley_tpu.data.loader import DevicePrefetcher

    def bad():
        yield {"x": np.zeros(2, np.float32)}
        raise ValueError("boom")

    it = iter(DevicePrefetcher(bad()))
    next(it)
    with pytest.raises(RuntimeError, match="device prefetch failed"):
        next(it)


def test_device_prefetcher_early_abandon_joins_feeder(dataset):
    import threading
    import time

    from diff_foley_tpu.data.loader import DevicePrefetcher, PrefetchLoader

    before = threading.active_count()
    loader = PrefetchLoader(dataset, batch_size=2, num_workers=2)
    for _ in range(3):
        for _b in DevicePrefetcher(loader.epoch(0), depth=1):
            break  # abandon with the feeder mid-stage
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1
