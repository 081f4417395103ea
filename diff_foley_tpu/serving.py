"""Production serving: request batching over the compiled pipeline.

Beyond-reference capability (the reference ships only a notebook). Design:

- One compiled program per (windows, samples) bucket; requests are padded to
  the nearest bucket so XLA never recompiles in steady state.
- A batcher thread collects requests up to `max_batch_windows` or
  `max_wait_ms`, runs them as one device batch, and fans results back out.
- `FoleyServer` wraps it in a stdlib ThreadingHTTPServer:
    POST /generate        body: {"features": [[...512 floats...], ...]} (T×512)
    POST /generate_video  body: raw video bytes (decoded host-side via cv2 →
                          CAVP features); 501 unless the server was built
                          with a `feature_fn`
    GET  /healthz
"""
from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import jax
import numpy as np

from .pipeline import DiffFoleyPipeline, GenerationConfig, WINDOW_FEATS


class _Request:
    def __init__(self, feats: np.ndarray):
        self.feats = feats  # (w, WINDOW_FEATS, 512)
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None


class BatchingEngine:
    """Collect feature windows from many requests into one device batch."""

    def __init__(
        self,
        pipe: DiffFoleyPipeline,
        gen: GenerationConfig = GenerationConfig(
            sample_num=1, return_spec=False, wav_dtype="int16"),
        max_batch_windows: int = 16,
        max_wait_ms: float = 30.0,
        seed: int = 0,
    ):
        self.pipe = pipe
        self.gen = gen
        if pipe.mesh is not None:
            # buckets are rounded up to a multiple of the data-mesh degree in
            # _run; keep the hard cap consistent with that rounding so the
            # rounded bucket can never exceed it
            d = pipe.mesh.shape["data"]
            max_batch_windows = -(-max_batch_windows // d) * d
        self.max_windows = max_batch_windows
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._key = jax.random.PRNGKey(seed)
        # continue_audio splits the key from HTTP handler threads while the
        # batcher thread splits it in _run: serialize the read-split-write
        self._key_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, feats: np.ndarray, timeout: float = 120.0) -> np.ndarray:
        """(T, 512) features → (n_windows·WINDOW_SAMPLES,) waveform."""
        w = feats.shape[0] // WINDOW_FEATS
        if w < 1:
            raise ValueError(f"need ≥{WINDOW_FEATS} features, got {feats.shape[0]}")
        req = _Request(
            feats[: w * WINDOW_FEATS].reshape(w, WINDOW_FEATS, -1).astype(
                np.float32
            )
        )
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch: List[_Request] = [first]
            n_windows = first.feats.shape[0]
            deadline = time.time() + self.max_wait
            while n_windows < self.max_windows and time.time() < deadline:
                try:
                    nxt = self._q.get(timeout=max(deadline - time.time(), 0.001))
                except queue.Empty:
                    break
                batch.append(nxt)
                n_windows += nxt.feats.shape[0]
            self._run(batch)

    def aot_warmup(self, buckets=None, cache_dir=None):
        """Build or RESTORE the fused executable for every bucket this
        engine can hit (the power-of-two ladder up to max_windows).

        Restarts are the point: the persistent XLA cache skips recompiles
        but not jax tracing, which dominates (457.8 s trace+lower vs 4.2 s
        cached compile for the 16-window flagship bucket). A previously
        warmed process serialized each executable (utils/aot.py); this
        restores them in seconds. Returns {bucket: ("loaded"|"compiled",
        seconds)} — see pipeline.aot_warmup."""
        if buckets is None:
            buckets, b = [], 1
            while b < self.max_windows:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_windows)
        if self.pipe.mesh is not None:
            # _run rounds every bucket up to a multiple of the data-mesh
            # degree before dispatch; warm exactly the reachable set (the
            # raw power-of-two ladder would lower shapes that can't shard)
            d = self.pipe.mesh.shape["data"]
            seen, reachable = set(), []
            for b in buckets:
                r = -(-int(b) // d) * d
                if r not in seen:
                    seen.add(r)
                    reachable.append(r)
            buckets = reachable
        return self.pipe.aot_warmup(buckets, self.gen, cache_dir=cache_dir)

    @staticmethod
    def _bucket(n: int, max_windows: int) -> int:
        """Smallest power-of-two bucket ≥ n, hard-capped at max_windows:
        small requests don't pay the full max-batch diffusion cost, each
        bucket compiles exactly once, and oversize streams are chunked
        through the fixed program (generate's bucket_windows path) instead
        of compiling a new unbounded shape."""
        b = 1
        while b < n and b < max_windows:
            b *= 2
        return min(b, max_windows)

    def _run(self, batch: List[_Request]):
        try:
            feats = np.concatenate([r.feats for r in batch], axis=0)
            n_windows = feats.shape[0]
            bucket = self._bucket(n_windows, self.max_windows)
            if self.pipe.mesh is not None:  # bucket must divide over `data`
                d = self.pipe.mesh.shape["data"]
                bucket = -(-bucket // d) * d
            with self._key_lock:
                self._key, sub = jax.random.split(self._key)
            # bucket_windows pads/chunks internally and trims the padding,
            # so the output covers exactly n_windows
            out = self.pipe.generate(
                feats.reshape(-1, feats.shape[-1]), sub, self.gen,
                bucket_windows=bucket,
            )
            wav = out["wav"][0]  # sample 0, all windows concat
            win_len = wav.shape[-1] // n_windows
            i = 0
            for r in batch:
                w = r.feats.shape[0]
                r.result = wav[i * win_len : (i + w) * win_len]
                i += w
                r.event.set()
        except Exception as e:  # pragma: no cover
            for r in batch:
                r.error = str(e)
                r.event.set()

    def continue_audio(self, feats: np.ndarray, known_spec: np.ndarray,
                       known_seconds: float) -> np.ndarray:
        """Audio continuation through the pipeline's masked (inpaint) path:
        keep the first `known_seconds` of `known_spec` (a normalised mel
        image), regenerate the rest against `feats`. Runs unbatched — the
        masked program is a different executable per window count and
        continuation requests are rare next to plain generation."""
        import dataclasses

        from .pipeline import SPEC_HW, continuation_mask, window_features

        gen = self.gen
        if gen.sampler not in ("ddim", "ancestral"):
            gen = dataclasses.replace(gen, sampler="ddim")
        feats = np.asarray(feats, np.float32)
        w = window_features(feats).shape[0]
        need = w * SPEC_HW[1]
        known_spec = np.asarray(known_spec, np.float32)
        if known_spec.shape[1] < need:
            known_spec = np.tile(
                known_spec, (1, -(-need // known_spec.shape[1])))
        known_spec = known_spec[:, :need]
        frames = int(round(known_seconds * self.pipe.melspec.sr
                           / self.pipe.melspec.hop_length))
        mask = continuation_mask(need, min(frames, need))
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        out = self.pipe.inpaint(feats, known_spec, mask, sub, gen)
        return out["wav"][0]

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=2)


class FoleyServer:
    """Stdlib HTTP front-end for the batching engine."""

    def __init__(self, engine: BatchingEngine, host="127.0.0.1", port=8787,
                 feature_fn=None):
        """`feature_fn(video_path) -> (T, 512) np.ndarray` enables the
        /generate_video route (e.g. `DiffFoley.extract_features`)."""
        self.engine = engine
        eng = engine

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                try:
                    if self.path == "/generate":
                        n = int(self.headers.get("Content-Length", 0))
                        payload = json.loads(self.rfile.read(n))
                        feats = np.asarray(payload["features"], np.float32)
                        if feats.ndim != 2 or feats.shape[1] != 512:
                            raise ValueError(
                                f"features must be (T, 512), got {feats.shape}"
                            )
                    elif self.path == "/generate_video":
                        if feature_fn is None:
                            self._send(
                                501,
                                {"error": "server built without a feature_fn"},
                            )
                            return
                        n = int(self.headers.get("Content-Length", 0))
                        import tempfile

                        with tempfile.NamedTemporaryFile(
                            suffix=".mp4"
                        ) as tmp:
                            tmp.write(self.rfile.read(n))
                            tmp.flush()
                            feats = np.asarray(feature_fn(tmp.name), np.float32)
                    elif self.path == "/continue":
                        n = int(self.headers.get("Content-Length", 0))
                        payload = json.loads(self.rfile.read(n))
                        feats = np.asarray(payload["features"], np.float32)
                        if "known_spec" in payload:
                            spec = np.asarray(
                                payload["known_spec"], np.float32)
                        elif "known_wav" in payload:
                            from .audio.transforms import wav_to_mel

                            mel = eng.pipe.melspec
                            sr = int(payload.get("sr", mel.sr))
                            if sr != mel.sr:
                                raise ValueError(
                                    f"known_wav must be {mel.sr} Hz, got {sr}"
                                )
                            spec = np.asarray(wav_to_mel(
                                np.asarray(payload["known_wav"], np.float32),
                                mel))
                        else:
                            raise KeyError("known_spec or known_wav")
                        wav = eng.continue_audio(
                            feats, spec, float(payload["known_seconds"]))
                        if wav.dtype == np.int16:
                            wav = wav.astype(np.float32) / 32767.0
                        self._send(200, {
                            "sr": eng.pipe.melspec.sr,
                            "num_samples": int(wav.shape[-1]),
                            "wav": wav.astype(float).round(6).tolist(),
                        })
                        return
                    else:
                        self._send(404, {"error": "not found"})
                        return
                    wav = eng.submit(feats)
                    if wav.dtype == np.int16:  # wav_dtype="int16" pipelines
                        wav = wav.astype(np.float32) / 32767.0
                    self._send(200, {
                        "sr": eng.pipe.melspec.sr,
                        "num_samples": int(wav.shape[-1]),
                        "wav": wav.astype(float).round(6).tolist(),
                    })
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:
                    self._send(500, {"error": str(e)})

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()
