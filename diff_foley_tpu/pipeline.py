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
    # extra sampler options as hashable (key, value) pairs — GenerationConfig
    # is a static jit arg. For sampler="dpm" this exposes the full solver
    # library (diffusion/samplers.py): order 1-3, method
    # multistep/singlestep/singlestep_fixed/adaptive, skip_type, thresholding.
    # e.g. solver_opts=(("order", 3), ("method", "singlestep"))
    solver_opts: tuple = ()


def window_features(feats: np.ndarray, window: int = WINDOW_FEATS) -> np.ndarray:
    """(T, 512) feature stream → (num_windows, window, 512), truncating the
    ragged tail like the notebook's `range(len // truncate_len)` loop."""
    n = feats.shape[0] // window
    assert n >= 1, f"need ≥{window} features, got {feats.shape[0]}"
    return feats[: n * window].reshape(n, window, feats.shape[-1])


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
                           x_T=None):
        """`x_T` (w·sample_num, *LATENT_HW, C) overrides the key-derived
        initial noise — parity harnesses share one x_T with the reference."""
        w, f, d = feats_w.shape
        s = gen.sample_num
        cond = jnp.repeat(feats_w, s, axis=0)  # (w*s, f, d)
        use_clf = gen.classifier_scale > 0 and self.classifier is not None
        z = self.ldm.sample(
            params, cond, key,
            latent_hw=LATENT_HW,
            sampler=gen.sampler,
            steps=gen.steps,
            cfg_scale=gen.cfg_scale,
            classifier=self.classifier if use_clf else None,
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
    # pays a ~30 ms round trip on the axon link)
    @partial(jax.jit, static_argnames=("self", "gen"))
    def _generate_fused(self, params, vae_params, feats_w, k_s, k_g, gen):
        specs = self._sample_and_decode(params, vae_params, feats_w, k_s, gen)
        wavs = mel_to_wav(
            specs, k_g, self.melspec, n_iter=gen.gl_iters,
            length=WINDOW_SAMPLES,
        )
        return specs, wavs

    def _fused_call(self, feats_w, k_s, k_g, gen):
        """Dispatch to an AOT-loaded executable when one matches this
        (window-count, gen) bucket, else the jit path."""
        g = self._aot.get((int(feats_w.shape[0]), gen))
        if g is not None:
            return g(self.params, self.vae_params, feats_w, k_s, k_g)
        return self._generate_fused(
            self.params, self.vae_params, feats_w, k_s, k_g, gen)

    def aot_warmup(self, window_buckets, gen: "GenerationConfig",
                   cache_dir=None):
        """Pre-build (or restore) the fused executable for each window
        bucket via the AOT cache (utils/aot.py).

        The persistent XLA cache only skips the compile; a warm process
        restart still pays jax trace+lower, which DOMINATES for this
        program (measured 457.8 s trace+lower vs 4.2 s cached compile for
        the 16-window flagship bucket). A serialized executable restores in
        seconds. First call per (bucket, gen, jaxlib, device-kind) traces
        and persists; every later process restores without tracing.

        Returns {bucket: ("loaded"|"compiled", seconds)}.
        """
        import time as _time

        from .utils.aot import (
            aot_cache_dir, cache_key, load_executable, save_executable,
        )

        d = aot_cache_dir(cache_dir)

        def plain(params, vae_params, feats_w, k_s, k_g):
            specs = self._sample_and_decode(
                params, vae_params, feats_w, k_s, gen)
            wavs = mel_to_wav(
                specs, k_g, self.melspec, n_iter=gen.gl_iters,
                length=WINDOW_SAMPLES,
            )
            return specs, wavs

        # deserialize_and_load rebinds an executable to ALL local devices,
        # so the disk path is only sound on single-device processes (the
        # serving topology); multi-device hosts still get the in-process
        # AOT dict (no retracing per generate), just no cross-process reuse
        single = len(jax.devices()) == 1
        report = {}
        for w in window_buckets:
            w = int(w)
            path = os.path.join(d, cache_key(
                f"fused-w{w}", gen=repr(gen), mel=repr(self.melspec),
                vae_dtype=str(self.vae_compute),
                unet=repr(self.ldm.cfg),
            ))
            t0 = _time.time()
            g = load_executable(path) if single else None
            if g is None:
                feats = jnp.zeros((w, WINDOW_FEATS, 512))
                key = jax.random.PRNGKey(0)
                compiled = jax.jit(plain).lower(
                    self.params, self.vae_params, feats, key, key
                ).compile()
                if single:
                    save_executable(path, compiled)
                    g = load_executable(path) or compiled
                else:
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

        s = gen.sample_num
        wavs = np.asarray(wavs).reshape(wp, s, -1)[:w]
        out = {"wav": wavs.transpose(1, 0, 2).reshape(s, -1)}
        if gen.return_spec:
            # (wp*s, 128, T) → per-sample time-concatenated windows
            sp = np.asarray(specs).reshape(wp, s, *specs.shape[1:])[:w]
            out["spec"] = sp.transpose(1, 2, 0, 3).reshape(
                s, sp.shape[2], -1)
        return out

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
