"""ctypes binding for the native C++ tar-shard reader (native/shard_reader.cpp).

Drop-in accelerated front-end for data.cavp_shards: reader threads in C++
stream tar members and pair spec/video bytes into a ring buffer; Python only
decodes (cv2 JPEG / numpy npy) and applies the intra-contrast sampling.

Builds the shared library on first use (g++, no external deps); falls back
to the pure-python tarfile path when a compiler is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libshardreader.so"))
_lib = None


def build_native(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    return _LIB_PATH


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shard_reader_open.restype = ctypes.c_void_p
    lib.shard_reader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.shard_reader_next.restype = ctypes.c_int
    lib.shard_reader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.shard_reader_free_sample.argtypes = [ctypes.c_void_p]
    lib.shard_reader_failed.restype = ctypes.c_int
    lib.shard_reader_failed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
    ]
    lib.shard_reader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeShardReader:
    """Iterates (key, spec_bytes, video_bytes) from tar shards via C++."""

    def __init__(self, shard_paths: Sequence[str], n_threads: int = 4,
                 ring_capacity: int = 64):
        lib = _load_lib()
        arr = (ctypes.c_char_p * len(shard_paths))(
            *[p.encode() for p in shard_paths]
        )
        self._lib = lib
        self._h = lib.shard_reader_open(
            arr, len(shard_paths), n_threads, ring_capacity
        )
        self._closed = False

    def __iter__(self) -> Iterator[tuple]:
        lib = self._lib
        while True:
            sample = ctypes.c_void_p()
            key = ctypes.c_char_p()
            spec_p = ctypes.POINTER(ctypes.c_uint8)()
            spec_n = ctypes.c_uint64()
            vid_p = ctypes.POINTER(ctypes.c_uint8)()
            vid_n = ctypes.c_uint64()
            ok = lib.shard_reader_next(
                self._h, ctypes.byref(sample), ctypes.byref(key),
                ctypes.byref(spec_p), ctypes.byref(spec_n),
                ctypes.byref(vid_p), ctypes.byref(vid_n),
            )
            if not ok:
                # end of stream OR a worker died on a corrupt shard — the
                # C++ side converts worker exceptions into a failed flag
                # instead of std::terminate; surface them as a catchable
                # RuntimeError here
                msg = ctypes.c_char_p()
                if lib.shard_reader_failed(self._h, ctypes.byref(msg)):
                    raise RuntimeError(
                        f"native shard reader failed: {msg.value.decode()}"
                    )
                return
            try:
                spec = ctypes.string_at(spec_p, spec_n.value)
                video = ctypes.string_at(vid_p, vid_n.value)
                yield key.value.decode(), spec, video
            finally:
                lib.shard_reader_free_sample(sample)

    def close(self):
        if not self._closed:
            self._lib.shard_reader_close(self._h)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def iter_shards_native(
    shard_paths: Sequence[str],
    *,
    seed: int = 0,
    epoch: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    cfg=None,
    n_threads: int = 4,
    shuffle_buffer: int = 256,
    decode_workers: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Native-IO version of data.cavp_shards.iter_shards (same output).

    `decode_workers > 0` pipelines the JPEG/npy decode + crop across a
    thread pool (cv2.imdecode releases the GIL): the C++ reader streams
    raw bytes, the pool decodes up to 2×workers samples ahead. The sample
    MULTISET and every per-sample crop stay deterministic (crops are keyed
    on (seed, epoch, key)); emission order is arrival-order-dependent
    either way — C++ reader threads already deliver nondeterministically.
    This is the knob that matters for feeding a training step:
    single-threaded decode of 224² strips tops out well below the device's
    clip rate (see bench.py stage-1 fed bench).

    Falls back to the pure-python tarfile path (with a warning) when the
    shared library can't be built — e.g. no compiler on the host."""
    from .cavp_shards import CAVPShardConfig, decode_sample, sample_rng

    try:
        _load_lib()
    except (OSError, subprocess.CalledProcessError) as e:
        import warnings

        from .cavp_shards import iter_shards

        warnings.warn(
            f"native shard reader unavailable ({e}); "
            "falling back to the pure-python tarfile reader"
        )
        yield from iter_shards(
            shard_paths, seed=seed, epoch=epoch,
            process_index=process_index, process_count=process_count,
            cfg=cfg or CAVPShardConfig(),
        )
        return

    cfg = cfg or CAVPShardConfig()
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(len(shard_paths))
    mine = [
        shard_paths[i]
        for j, i in enumerate(order)
        if j % process_count == process_index
    ]
    # per-sample rngs: crops are deterministic in (seed, epoch, key) even
    # though C++ reader threads deliver samples in nondeterministic order;
    # a small reservoir decorrelates emission order from tar order. Raw
    # bytes are buffered (decode at yield) — a decoded sample is ~29 MB,
    # so a 256-deep decoded buffer would hold ~7 GB of host RAM.
    buf = []

    def _decode(item):
        key, spec_bytes, video_bytes = item
        return decode_sample(
            spec_bytes, video_bytes, sample_rng(seed, epoch, key), cfg
        )

    if decode_workers > 0:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        pending = collections.deque()
        with NativeShardReader(mine, n_threads=n_threads) as reader, \
                ThreadPoolExecutor(decode_workers) as pool:
            for key, spec_bytes, video_bytes in reader:
                buf.append((key, bytes(spec_bytes), bytes(video_bytes)))
                if len(buf) >= shuffle_buffer:
                    pending.append(pool.submit(
                        _decode, buf.pop(int(rng.integers(0, len(buf))))
                    ))
                    while len(pending) > 2 * decode_workers:
                        yield pending.popleft().result()
            rng.shuffle(buf)
            for item in buf:
                pending.append(pool.submit(_decode, item))
            while pending:
                yield pending.popleft().result()
        return

    with NativeShardReader(mine, n_threads=n_threads) as reader:
        for key, spec_bytes, video_bytes in reader:
            buf.append((key, bytes(spec_bytes), bytes(video_bytes)))
            if len(buf) >= shuffle_buffer:
                yield _decode(buf.pop(int(rng.integers(0, len(buf)))))
    rng.shuffle(buf)
    for item in buf:
        yield _decode(item)
