"""End-to-end video→audio generation pipeline.

Mirrors the reference inference notebook (inference/diff_foley_inference.ipynb
cells 8-15, SURVEY.md §3.1) but fuses everything after feature extraction into
batched on-device programs: all 8.192-s windows × samples are sampled in ONE
scanned DPM-Solver run, decoded in one VAE batch, and inverted in one batched
Griffin-Lim call — no per-window python loop, no host round-trips.

Operating point (notebook cell 13): 25 DPM-Solver++ steps, CFG 4.5,
classifier-guidance 50, 4 samples/window, 32 CAVP features (4 FPS) per window,
window = 131072 samples @16 kHz = 512 mel frames.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio.transforms import DEFAULT_MELSPEC, MelSpec, mel_to_wav
from .diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from .utils.padding import pad_axis0_to_multiple

WINDOW_FEATS = 32          # CAVP features per window (notebook truncate_len)
WINDOW_SAMPLES = 131072    # 8.192 s at 16 kHz
LATENT_HW = (16, 64)       # 128×512 mel /8


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    sampler: str = "dpm"
    steps: int = 25
    cfg_scale: float = 4.5
    classifier_scale: float = 50.0
    sample_num: int = 4
    gl_iters: int = 32
    return_spec: bool = True  # False skips the spec host transfer (serving)
    # dtype the fused program returns waveforms in. "int16" converts on
    # device with write_wav's exact quantization (clip·32767), halving the
    # bulk host transfer — byte-identical wav files, so serving/bench run
    # int16. "float32" (default) keeps the raw Griffin-Lim output for
    # API consumers that post-process audio.
    wav_dtype: str = "float32"
    # extra sampler options as hashable (key, value) pairs — GenerationConfig
    # is a static jit arg. For sampler="dpm" this exposes the full solver
    # library (diffusion/samplers.py): order 1-3, method
    # multistep/singlestep/singlestep_fixed/adaptive, skip_type, thresholding.
    # e.g. solver_opts=(("order", 3), ("method", "singlestep"))
    solver_opts: tuple = ()


def _pack_wav(wavs: jnp.ndarray, wav_dtype: str) -> jnp.ndarray:
    """On-device waveform packing for the bulk host transfer.

    "int16" applies utils/wav.py::write_wav's exact quantization
    (clip(-1,1)·32767 → i16) before the transfer: the wav FILE bytes are
    identical, the relay transfer is half the size."""
    if wav_dtype == "float32":
        return wavs
    if wav_dtype == "int16":
        # astype matches write_wav's C-cast truncation (NOT round), so the
        # file bytes equal the float32-path file bytes exactly
        return (jnp.clip(wavs, -1.0, 1.0) * 32767.0).astype(jnp.int16)
    if wav_dtype in ("float64", "bfloat16", "float16"):
        return wavs.astype(jnp.dtype(wav_dtype))
    # any other integer cast of [-1,1] floats truncates to {-1,0,1} —
    # silent garbage audio, so reject instead
    raise ValueError(
        f"unsupported wav_dtype {wav_dtype!r}: use 'float32', 'int16', or a "
        "float width")


def window_features(feats: np.ndarray, window: int = WINDOW_FEATS) -> np.ndarray:
    """(T, 512) feature stream → (num_windows, window, 512), truncating the
    ragged tail like the notebook's `range(len // truncate_len)` loop."""
    n = feats.shape[0] // window
    assert n >= 1, f"need ≥{window} features, got {feats.shape[0]}"
    return feats[: n * window].reshape(n, window, feats.shape[-1])


SPEC_HW = (LATENT_HW[0] * 8, LATENT_HW[1] * 8)  # (128 mel, 512 frames)/window


def continuation_mask(
    n_frames: int, known_frames: int, n_mels: int = SPEC_HW[0]
) -> np.ndarray:
    """Spec-space keep-mask for audio continuation: the first
    `known_frames` mel frames (hop 256 @16 kHz → 62.5 frames/s) are KNOWN
    (kept from the given spec), the rest are generated."""
    m = np.zeros((n_mels, n_frames), np.float32)
    m[:, :known_frames] = 1.0
    return m


def spec_mask_to_latent(mask_w: np.ndarray) -> np.ndarray:
    """(w, 128, 512) spec-space keep-mask → (w, 16, 64, 1) latent mask by
    8×8 min-pool: a latent cell counts as KNOWN only when its whole 8×8
    spec patch is known, so partially-known patches are regenerated rather
    than leaking unknown content through the blend."""
    w, h, f = mask_w.shape
    assert h % 8 == 0 and f % 8 == 0, (h, f)
    return mask_w.reshape(w, h // 8, 8, f // 8, 8).min(axis=(2, 4))[..., None]


class DiffFoleyPipeline:
    """Bundles the LDM + (optional) alignment classifier for inference."""

    def __init__(
        self,
        ldm: Optional[LatentDiffusion] = None,
        params=None,
        vae_params=None,
        classifier=None,  # (apply_fn, params)
        melspec: MelSpec = DEFAULT_MELSPEC,
        mesh=None,
        vae_dtype=None,
    ):
        """`mesh` (with a `data` axis) runs generation data-parallel over
        chips: params replicated, windows sharded P('data'), GSPMD inserts
        the collectives — multi-chip serving without code changes.

        `vae_dtype="bfloat16"` runs the first-stage decode in bf16 (conv
        kernels + activations; GroupNorm stats stay fp32 per the
        GroupNorm32 policy). Drift vs fp32 is recorded in
        PARITY_FLAGSHIP.json; the decoded spec is upcast to fp32 before
        clipping/Griffin-Lim either way."""
        self.ldm = ldm or LatentDiffusion(LDMConfig())
        self.params = params
        self.vae_compute = jnp.dtype(vae_dtype) if vae_dtype else None
        if self.vae_compute is not None and vae_params is not None:
            from .utils.precision import cast_floating

            vae_params = cast_floating(vae_params, self.vae_compute)
        self.vae_params = vae_params
        self.classifier = classifier
        self.melspec = melspec
        self._aot = {}  # (windows, gen) → AOT-loaded executable (aot_warmup)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._repl = NamedSharding(mesh, P())
            self._dsh = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(params, self._repl)
            self.vae_params = jax.device_put(vae_params, self._repl)
            if classifier is not None:
                fn, cp = classifier[:2]
                self.classifier = (fn, jax.device_put(cp, self._repl))

    def _shard_batch(self, *arrays):
        """Pad axis 0 to a multiple of the data-axis size and shard."""
        if self.mesh is None:
            return [jnp.asarray(a) for a in arrays], arrays[0].shape[0]
        n = self.mesh.shape["data"]
        w = arrays[0].shape[0]
        out = [
            jax.device_put(pad_axis0_to_multiple(a, n), self._dsh)
            for a in arrays
        ]
        return out, w

    # one compiled program: windows×samples latents → specs
    @partial(jax.jit, static_argnames=("self", "gen"))
    def _sample_and_decode(self, params, vae_params, feats_w, key, gen,
                           x_T=None, clf_params=None):
        """`x_T` (w·sample_num, *LATENT_HW, C) overrides the key-derived
        initial noise — parity harnesses share one x_T with the reference.

        `clf_params` overrides the classifier weights captured in
        `self.classifier` — the AOT path passes them as a RUNTIME argument
        so a restored executable always guides with the current weights
        (a closure capture would bake retrained-stale params into the
        serialized program)."""
        w, f, d = feats_w.shape
        s = gen.sample_num
        cond = jnp.repeat(feats_w, s, axis=0)  # (w*s, f, d)
        use_clf = gen.classifier_scale > 0 and self.classifier is not None
        clf = None
        if use_clf:
            clf = (self.classifier[0],
                   self.classifier[1] if clf_params is None else clf_params)
        z = self.ldm.sample(
            params, cond, key,
            latent_hw=LATENT_HW,
            sampler=gen.sampler,
            steps=gen.steps,
            cfg_scale=gen.cfg_scale,
            classifier=clf,
            classifier_scale=gen.classifier_scale if use_clf else 0.0,
            x_T=x_T,
            **dict(gen.solver_opts),
        )
        if self.vae_compute is not None:
            z = z.astype(self.vae_compute)
        spec_img = self.ldm.decode_first_stage(vae_params, z)  # (w*s,128,512,3)
        return jnp.clip(spec_img[..., 0].astype(jnp.float32), 0.0, 1.0)

    @partial(jax.jit, static_argnames=("self", "gen"))
    def _invert(self, specs, key, gen):
        return mel_to_wav(
            specs, key, self.melspec, n_iter=gen.gl_iters, length=WINDOW_SAMPLES
        )

    # sampler + VAE decode + Griffin-Lim as ONE compiled program: a single
    # relay dispatch per generate() call instead of three (each dispatch
    # pays a ~30 ms round trip on the axon link). Classifier params are a
    # RUNTIME argument (not a closure constant): the jit and AOT paths then
    # compile the SAME program — baking them in lets XLA constant-fold the
    # guidance differently, which measurably drifts from the AOT executable
    # on TPU — and swapping classifier weights never serves stale guidance.
    @partial(jax.jit, static_argnames=("self", "gen"))
    def _generate_fused(self, params, vae_params, clf_params, feats_w,
                        k_s, k_g, gen):
        specs = self._sample_and_decode(params, vae_params, feats_w, k_s, gen,
                                        clf_params=clf_params)
        wavs = mel_to_wav(
            specs, k_g, self.melspec, n_iter=gen.gl_iters,
            length=WINDOW_SAMPLES,
        )
        return specs, _pack_wav(wavs, gen.wav_dtype)

    # masked (inpainting/continuation) twin of _generate_fused: the known
    # latent region is re-imposed every sampler step (ddim.py:210-213 via
    # diffusion/samplers.py mask/x0; parity: tests/test_ancestral_inpaint_parity.py)
    @partial(jax.jit, static_argnames=("self", "gen"))
    def _inpaint_fused(self, params, vae_params, clf_params, feats_w, spec_w,
                       mask_lat, k_s, k_g, gen):
        s = gen.sample_num
        cond = jnp.repeat(feats_w, s, axis=0)
        x_img = jnp.repeat(spec_w[..., None], 3, axis=-1)  # mel → 3-ch image
        if self.vae_compute is not None:
            x_img = x_img.astype(self.vae_compute)
        # deterministic encode (posterior mode): the known canvas must not
        # resample per call or the kept region would drift between runs
        z0 = self.ldm.encode_first_stage(vae_params, x_img)
        z0 = jnp.repeat(z0.astype(jnp.float32), s, axis=0)
        mask = jnp.repeat(mask_lat, s, axis=0)
        use_clf = gen.classifier_scale > 0 and self.classifier is not None
        # classifier params as runtime args, like _generate_fused
        clf = (self.classifier[0], clf_params) if use_clf else None
        z = self.ldm.sample(
            params, cond, k_s,
            latent_hw=LATENT_HW,
            sampler=gen.sampler,
            steps=gen.steps,
            cfg_scale=gen.cfg_scale,
            classifier=clf,
            classifier_scale=gen.classifier_scale if use_clf else 0.0,
            mask=mask, x0=z0,
            **dict(gen.solver_opts),
        )
        # Final known-region composite. The per-step blend (ddim.py:210-213)
        # pins the TRAJECTORY, but the last model update still rewrites the
        # known region by one denoise step — at small step counts that
        # leaves it between "known" and "generated". The pipeline contract
        # is "mask=1 is KEPT", so re-impose the canvas exactly before
        # decode; generated-region content is untouched.
        z = z0 * mask + (1.0 - mask) * z
        if self.vae_compute is not None:
            z = z.astype(self.vae_compute)
        spec_img = self.ldm.decode_first_stage(vae_params, z)
        specs = jnp.clip(spec_img[..., 0].astype(jnp.float32), 0.0, 1.0)
        wavs = mel_to_wav(
            specs, k_g, self.melspec, n_iter=gen.gl_iters,
            length=WINDOW_SAMPLES,
        )
        return specs, _pack_wav(wavs, gen.wav_dtype)

    def _clf_runtime_params(self):
        """Classifier params passed as a runtime arg to AOT executables
        (None when no classifier is attached)."""
        return self.classifier[1] if self.classifier is not None else None

    def _fused_call(self, feats_w, k_s, k_g, gen):
        """Dispatch to an AOT-loaded executable when one matches this
        (window-count, gen) bucket, else the jit path."""
        g = self._aot.get((int(feats_w.shape[0]), gen))
        if g is not None:
            return g(self.params, self.vae_params, self._clf_runtime_params(),
                     feats_w, k_s, k_g)
        return self._generate_fused(
            self.params, self.vae_params, self._clf_runtime_params(),
            feats_w, k_s, k_g, gen)

    def aot_warmup(self, window_buckets, gen: "GenerationConfig",
                   cache_dir=None):
        """Pre-build (or restore) the fused executable for each window
        bucket via the AOT cache (utils/aot.py).

        The persistent XLA cache only skips the compile; a warm process
        restart still pays jax trace+lower, which DOMINATES for this
        program (measured 457.8 s trace+lower vs 4.2 s cached compile for
        the 16-window flagship bucket). A serialized executable restores in
        seconds. First call per (bucket, gen, jaxlib, device-kind,
        topology) traces and persists; every later process with the same
        device topology restores without tracing.

        Classifier weights are a RUNTIME argument of the cached program
        (not baked in), so restoring after retraining the classifier
        guides with the new weights; the cache key still carries the
        classifier's tree STRUCTURE (shapes/dtypes + apply-fn name) so a
        differently-shaped classifier can never collide.

        Returns {bucket: ("loaded"|"compiled", seconds)}.
        """
        import time as _time

        from .utils.aot import (
            aot_cache_dir, cache_key, load_executable, save_executable,
        )

        d = aot_cache_dir(cache_dir)

        def plain(params, vae_params, clf_params, feats_w, k_s, k_g):
            specs = self._sample_and_decode(
                params, vae_params, feats_w, k_s, gen,
                clf_params=clf_params)
            wavs = mel_to_wav(
                specs, k_g, self.melspec, n_iter=gen.gl_iters,
                length=WINDOW_SAMPLES,
            )
            return specs, _pack_wav(wavs, gen.wav_dtype)

        clf_params = self._clf_runtime_params()
        # clf_params is a runtime INPUT of the lowered program whether or not
        # guidance is enabled (classifier_scale only gates the guidance term,
        # which `gen=repr(gen)` already keys), so the key must always carry
        # the classifier's tree structure: a no-classifier process and a
        # classifier-attached process must never share an executable — their
        # argument pytrees differ.
        clf_fp = "none"
        if self.classifier is not None:
            fn = self.classifier[0]
            struct = jax.tree.map(
                lambda a: (tuple(a.shape), str(a.dtype)), clf_params)
            clf_fp = f"{getattr(fn, '__qualname__', repr(fn))}|{struct!r}"
        # Executables bind to a concrete device assignment; deserialization
        # maps serialized device ids onto the current process's devices, so
        # disk reuse is sound exactly when the topology matches — key on it.
        topo = (
            tuple(getattr(dv, "id", i) for i, dv in enumerate(jax.devices())),
            None if self.mesh is None else tuple(self.mesh.shape.items()),
        )
        report = {}
        for w in window_buckets:
            w = int(w)
            if self.mesh is not None and w % self.mesh.shape["data"] != 0:
                raise ValueError(
                    f"bucket {w} does not divide over the data-mesh axis "
                    f"({self.mesh.shape['data']}); meshed dispatch rounds "
                    "buckets up — warm the rounded bucket instead "
                    "(BatchingEngine.aot_warmup does this automatically)"
                )
            path = os.path.join(d, cache_key(
                f"fused-w{w}", gen=repr(gen), mel=repr(self.melspec),
                vae_dtype=str(self.vae_compute),
                unet=repr(self.ldm.cfg),
                clf=clf_fp,
                topo=repr(topo),
            ))
            t0 = _time.time()
            g = load_executable(path)
            if g is None:
                feats = jnp.zeros((w, WINDOW_FEATS, 512))
                if self.mesh is not None:
                    # lower with the dispatch-time shardings or the cached
                    # executable rejects generate()'s P('data') inputs
                    feats = jax.device_put(feats, self._dsh)
                key = jax.random.PRNGKey(0)
                compiled = jax.jit(plain).lower(
                    self.params, self.vae_params, clf_params, feats, key, key
                ).compile()
                # cache write failures (unpicklable executable, full/readonly
                # disk) must not kill serving startup — the in-memory
                # executable is fully usable
                try:
                    save_executable(path, compiled)
                    g = load_executable(path) or compiled
                except Exception:  # noqa: BLE001
                    g = compiled
                report[w] = ("compiled", round(_time.time() - t0, 1))
            else:
                report[w] = ("loaded", round(_time.time() - t0, 1))
            self._aot[(w, gen)] = g
        return report

    def generate(
        self,
        cavp_feats: np.ndarray,
        key: jax.Array,
        gen: GenerationConfig = GenerationConfig(),
        bucket_windows: Optional[int] = None,
    ):
        """(T, 512) CAVP features → dict with specs and waveforms.

        Returns specs (S, num_windows*512 frames concat) and wav
        (S, num_windows*131072) for S = sample_num, mirroring notebook
        cells 13-14 (per-window generation then concatenation).

        `bucket_windows` processes the stream in fixed-size window buckets
        (last bucket padded): arbitrarily long videos reuse ONE compiled
        program with bounded HBM instead of compiling per video length.
        """
        if bucket_windows is not None:
            return self._generate_bucketed(
                cavp_feats, key, gen, bucket_windows)
        (feats_w,), w = self._shard_batch(
            window_features(np.asarray(cavp_feats)))
        wp = feats_w.shape[0]  # padded window count under a mesh
        k_s, k_g = jax.random.split(key)
        specs, wavs = self._fused_call(
            feats_w, k_s, k_g, gen
        )  # (wp*s, 128, 512), (wp*s, WINDOW_SAMPLES)
        return self._pack_outputs(specs, wavs, wp, w, gen)

    def _pack_outputs(self, specs, wavs, wp, w, gen):
        """(wp·s, …) device outputs → per-sample time-concatenated host dict,
        trimming mesh-padding windows wp→w."""
        s = gen.sample_num
        wavs = np.asarray(wavs).reshape(wp, s, -1)[:w]
        out = {"wav": wavs.transpose(1, 0, 2).reshape(s, -1)}
        if gen.return_spec:
            # (wp*s, 128, T) → per-sample time-concatenated windows
            sp = np.asarray(specs).reshape(wp, s, *specs.shape[1:])[:w]
            out["spec"] = sp.transpose(1, 2, 0, 3).reshape(
                s, sp.shape[2], -1)
        return out

    def inpaint(
        self,
        cavp_feats: np.ndarray,
        known_spec: np.ndarray,
        spec_mask: np.ndarray,
        key: jax.Array,
        gen: GenerationConfig = GenerationConfig(sampler="ddim"),
    ):
        """Masked generation: inpaint or continue audio against a video.

        The reference's DDIM/ancestral loops re-impose the known region each
        step as ``q_sample(x0, t)·mask + (1−mask)·x`` (ddim.py:210-213,
        ddpm.py:1224-1227); this surfaces that latent capability at the
        mel-spectrogram level:

        - ``known_spec`` (n_mels, frames): mel image in [0, 1] — e.g. a prior
          ``generate()`` output sample, or ``audio.transforms`` applied to
          recorded audio;
        - ``spec_mask`` (n_mels, frames): 1 = KEEP from known_spec,
          0 = generate (``continuation_mask`` builds the keep-the-first-K
          -frames case). Min-pooled 8×8 to latent resolution, so only fully
          known patches are pinned. KEEP is exact (up to the VAE roundtrip):
          after the per-step reference blend steers the trajectory, the
          known latents are re-imposed once more before decoding.

        Returns the same dict as ``generate``. Requires a masked-capable
        sampler (``ddim`` — the default here — or ``ancestral``); the
        DPM-Solver library has no mask path, matching the reference.
        """
        if gen.sampler not in ("ddim", "ancestral", "ddpm"):
            raise ValueError(
                f"inpainting needs sampler 'ddim' or 'ancestral' "
                f"(reference parity: ddim.py:210/ddpm.py:1224), got "
                f"{gen.sampler!r}"
            )
        feats_w = window_features(np.asarray(cavp_feats))
        w = feats_w.shape[0]
        n_mels, frames = SPEC_HW[0], w * SPEC_HW[1]
        known_spec = np.asarray(known_spec, np.float32)
        spec_mask = np.asarray(spec_mask, np.float32)
        if known_spec.shape != spec_mask.shape:
            raise ValueError(
                f"known_spec {known_spec.shape} vs spec_mask "
                f"{spec_mask.shape} shape mismatch")
        if known_spec.shape[0] != n_mels or known_spec.shape[1] < frames:
            raise ValueError(
                f"known_spec must be ({n_mels}, ≥{frames}) for {w} windows, "
                f"got {known_spec.shape}")
        # (mels, w·512) → per-window (w, mels, 512)
        to_w = lambda a: np.ascontiguousarray(
            a[:, :frames].reshape(n_mels, w, SPEC_HW[1]).transpose(1, 0, 2))
        spec_w = to_w(known_spec)
        mask_lat = spec_mask_to_latent(to_w(spec_mask))
        (feats_j, spec_j, mask_j), _ = self._shard_batch(
            feats_w, spec_w, mask_lat)
        wp = feats_j.shape[0]
        k_s, k_g = jax.random.split(key)
        specs, wavs = self._inpaint_fused(
            self.params, self.vae_params, self._clf_runtime_params(),
            feats_j, spec_j, mask_j, k_s, k_g, gen,
        )
        return self._pack_outputs(specs, wavs, wp, w, gen)

    def _generate_bucketed(self, cavp_feats, key, gen, bucket: int):
        """Fixed-bucket generation: pad the window stream to a multiple of
        `bucket`, run one compiled (bucket × sample) program per chunk, and
        trim the padding from the concatenated outputs."""
        feats_w = np.asarray(window_features(np.asarray(cavp_feats)))
        w = feats_w.shape[0]
        n_chunks = -(-w // bucket)
        feats_w = pad_axis0_to_multiple(feats_w, bucket)

        if self.mesh is not None:
            assert bucket % self.mesh.shape["data"] == 0, (
                "bucket_windows must divide over the data mesh axis"
            )
        s = gen.sample_num
        wavs, specs = [], []
        for c in range(n_chunks):
            chunk = feats_w[c * bucket : (c + 1) * bucket]
            if self.mesh is None:
                chunk = jnp.asarray(chunk)
            else:
                chunk = jax.device_put(chunk, self._dsh)
            k_s, k_g, key = jax.random.split(jax.random.fold_in(key, c), 3)
            spec_c, wav_c = self._fused_call(
                chunk, k_s, k_g, gen
            )  # (bucket*s, 128, 512), (bucket*s, WINDOW_SAMPLES)
            wavs.append(np.asarray(wav_c.reshape(bucket, s, -1)))
            if gen.return_spec:
                specs.append(np.asarray(
                    spec_c.reshape(bucket, s, *spec_c.shape[1:])))

        wav = np.concatenate(wavs, axis=0)[:w]        # (w, s, WINDOW_SAMPLES)
        out = {"wav": wav.transpose(1, 0, 2).reshape(s, -1)}
        if gen.return_spec:
            sp = np.concatenate(specs, axis=0)[:w]    # (w, s, 128, T)
            # per-sample time-concatenated windows → (s, 128, w·T)
            out["spec"] = sp.transpose(1, 2, 0, 3).reshape(
                s, sp.shape[2], -1)
        return out
