"""Native C++ shard reader vs python tarfile reader: identical samples."""
import io
import shutil
import tarfile

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    tmp = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    paths = []
    for si in range(2):
        p = tmp / f"shard-{si:06d}.tar"
        with tarfile.open(p, "w") as tf:
            for k in range(4):
                spec = rng.uniform(size=(128, 640)).astype(np.float32)
                buf = io.BytesIO()
                np.save(buf, spec)
                info = tarfile.TarInfo(f"s{si}_{k}.spec.npy")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tf.addfile(info, buf)
                strip = (rng.uniform(size=(224, 224 * 40, 3)) * 255).astype(
                    np.uint8
                )
                ok, enc = cv2.imencode(".jpg", strip)
                info = tarfile.TarInfo(f"s{si}_{k}.video.jpg")
                info.size = len(enc)
                tf.addfile(info, io.BytesIO(enc.tobytes()))
        paths.append(str(p))
    return paths


def test_native_reader_bytes_match_tarfile(shards):
    from diff_foley_tpu.data.native_loader import NativeShardReader, build_native

    build_native()
    native = {}
    with NativeShardReader(shards, n_threads=2) as r:
        for key, spec, video in r:
            native[key] = (spec, video)
    assert len(native) == 8

    for p in shards:
        with tarfile.open(p) as tf:
            members = {m.name: tf.extractfile(m).read() for m in tf if m.isfile()}
        for name, data in members.items():
            if name.endswith(".spec.npy"):
                key = name[:-9]
                assert native[key][0] == data, key
            else:
                key = name[:-10]
                assert native[key][1] == data, key


def test_native_iter_shards_decodes(shards):
    from diff_foley_tpu.data.native_loader import iter_shards_native

    samples = list(iter_shards_native(shards, seed=0, epoch=0))
    assert len(samples) == 8
    for s in samples:
        assert s["video"].shape == (3, 16, 224, 224, 3)
        assert s["spec"].shape == (3, 128, 256)


def test_native_reader_early_close(shards):
    from diff_foley_tpu.data.native_loader import NativeShardReader

    r = NativeShardReader(shards, n_threads=2, ring_capacity=2)
    it = iter(r)
    next(it)
    r.close()  # must not deadlock with blocked workers


def test_native_reader_corrupt_shard_raises(tmp_path):
    """Round-2 review: a corrupt tar header must surface as a catchable
    RuntimeError, not std::terminate (worker exception) or a silent EOF."""
    from diff_foley_tpu.data.native_loader import NativeShardReader

    p = tmp_path / "bad.tar"
    header = bytearray(512)
    name = b"x.spec.npy"
    header[: len(name)] = name
    # size field: absurd octal (claims ~68 GB member)
    header[124:136] = b"77777777777\x00"
    header[156] = ord("0")
    p.write_bytes(bytes(header) + b"\x00" * 1024)

    with NativeShardReader([str(p)], n_threads=1) as reader:
        with pytest.raises(RuntimeError, match="corrupt tar header"):
            list(reader)


def test_native_iter_shards_python_fallback(shards, monkeypatch):
    """Documented fallback: when the shared lib can't load, iter_shards_native
    degrades to the pure-python tarfile reader with a warning."""
    import diff_foley_tpu.data.native_loader as nl
    from diff_foley_tpu.data.cavp_shards import CAVPShardConfig

    def boom(*a, **k):
        raise OSError("no compiler")

    monkeypatch.setattr(nl, "_load_lib", boom)
    cfg = CAVPShardConfig(clip_num=2)
    with pytest.warns(UserWarning, match="falling back"):
        out = list(nl.iter_shards_native([shards[0]], cfg=cfg))
    assert len(out) == 4  # all samples of shard 0 via the python path
