"""Video → foley audio generation CLI (the notebook pipeline as a command).

Reference equivalent: inference/diff_foley_inference.ipynb cells 3-15.

Usage:
  python -m diff_foley_tpu.cli.generate --video path/to.mp4 --out out_dir \
      [--cavp-ckpt cavp_epoch66.ckpt --ldm-ckpt ldm_epoch240.ckpt \
       --classifier-ckpt double_guidance_classifier.ckpt] \
      [--cfg-scale 4.5 --cg-scale 50 --steps 25 --sample-num 4]

Without checkpoints (--random-weights) it runs the full pipeline with random
parameters — useful only for smoke/perf runs.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", required=True)
    p.add_argument("--out", default="./generated")
    p.add_argument("--start-second", type=float, default=0.0)
    p.add_argument("--truncate-second", type=float, default=8.2)
    p.add_argument("--cavp-ckpt", default=None)
    p.add_argument("--ldm-ckpt", default=None)
    p.add_argument("--classifier-ckpt", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--cfg-scale", type=float, default=4.5)
    p.add_argument("--cg-scale", type=float, default=50.0)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--sample-num", type=int, default=4)
    p.add_argument("--sampler", default="dpm", choices=["dpm", "ddim", "plms"])
    p.add_argument(
        "--continue-from", default=None,
        help="audio continuation: a 16 kHz .wav or a normalised mel-spec "
             ".npy whose first --known-seconds are KEPT; the rest is "
             "regenerated against the video (DDIM mask/x0 path, "
             "ddim.py:210-213 — forces --sampler ddim unless one of "
             "ddim/ancestral is chosen)")
    p.add_argument(
        "--known-seconds", type=float, default=None,
        help="how much of --continue-from to keep (required with it)")
    p.add_argument("--seed", type=int, default=21)  # notebook cell 9
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--frame-size", type=int, default=None,
                   help="ingest resize; defaults to the geometry a native "
                        "CAVP logdir was trained at, else 224")
    return p.parse_args(argv)


def _continue_audio(pipe, feats, args, gen):
    """--continue-from: keep the first --known-seconds of the given audio
    (wav or normalised mel .npy) and regenerate the rest against the video
    features via the DDIM mask/x0 path (pipeline.inpaint)."""
    from ..audio.transforms import wav_to_mel
    from ..pipeline import SPEC_HW, continuation_mask, window_features

    if args.known_seconds is None:
        raise SystemExit("--continue-from requires --known-seconds")
    src = args.continue_from
    if src.endswith(".npy"):
        spec = np.asarray(np.load(src), np.float32)
        if spec.ndim != 2 or spec.shape[0] != SPEC_HW[0]:
            raise SystemExit(
                f"--continue-from spec must be ({SPEC_HW[0]}, frames), "
                f"got {spec.shape}")
    else:
        from ..utils.wav import read_wav

        wav, sr = read_wav(src)
        if sr != pipe.melspec.sr:
            raise SystemExit(
                f"--continue-from wav must be {pipe.melspec.sr} Hz, got {sr}")
        spec = np.asarray(wav_to_mel(jnp.asarray(wav), pipe.melspec))
    w = window_features(np.asarray(feats)).shape[0]
    need = w * SPEC_HW[1]
    if spec.shape[1] < need:  # tile-pad to the generated length
        reps = -(-need // spec.shape[1])
        spec = np.tile(spec, (1, reps))
    spec = spec[:, :need]
    known_frames = int(round(
        args.known_seconds * pipe.melspec.sr / pipe.melspec.hop_length))
    mask = continuation_mask(need, min(known_frames, need))
    return pipe.inpaint(feats, spec, mask, jax.random.PRNGKey(args.seed + 5),
                        gen)


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import dataclasses

    from ..diffusion.latent_diffusion import LatentDiffusion, LDMConfig
    from ..models.cavp import CAVPModel
    from ..models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone
    from ..pipeline import DiffFoleyPipeline, GenerationConfig
    from ..utils.precision import cast_floating
    from ..utils.wav import write_wav
    from ..video.ingest import extract_cavp_features

    if not (args.random_weights or (args.cavp_ckpt and args.ldm_ckpt)):
        raise SystemExit(
            "provide --cavp-ckpt/--ldm-ckpt or pass --random-weights"
        )

    from ..utils.checkpoint import is_native_logdir

    key = jax.random.PRNGKey(args.seed)

    # --- LDM: native logdir > torch ckpt > random
    vae_params = None
    if is_native_logdir(args.ldm_ckpt):
        from ..utils.checkpoint import load_native_ldm

        ldm, params, vae_params = load_native_ldm(args.ldm_ckpt)
        if vae_params is None:
            raise SystemExit(f"{args.ldm_ckpt}/vae holds no first-stage VAE")
    else:
        ldm = LatentDiffusion(LDMConfig())
        if args.ldm_ckpt:
            from ..utils.checkpoint import load_reference_ldm

            params, vae_params = load_reference_ldm(args.ldm_ckpt, ldm)
        else:
            # jitted init: one compiled program, not thousands of
            # relay-costly eager op dispatches
            params = jax.jit(ldm.init_params)(jax.random.PRNGKey(args.seed + 1))
            vae_params = jax.jit(ldm.init_vae_params)(
                jax.random.PRNGKey(args.seed + 2)
            )
    if args.bf16:
        ldm = LatentDiffusion(dataclasses.replace(
            ldm.cfg, unet=dataclasses.replace(ldm.cfg.unet, dtype="bfloat16")
        ))

    # --- CAVP features
    if is_native_logdir(args.cavp_ckpt):
        from ..utils.checkpoint import load_native_cavp, native_cavp_ingest_size

        cavp, cavp_vars = load_native_cavp(args.cavp_ckpt)
        if args.frame_size is None:
            args.frame_size = native_cavp_ingest_size(args.cavp_ckpt)
    else:
        cavp = CAVPModel()
        if args.cavp_ckpt:
            from ..utils.checkpoint import load_reference_cavp

            cavp_vars = load_reference_cavp(args.cavp_ckpt)
        else:
            cavp_vars = cavp.init(
                key, jnp.zeros((1, 2, 224, 224, 3)), jnp.zeros((1, 128, 32)),
                train=False,
            )
    encode = jax.jit(
        lambda v, x: cavp.apply(
            v, jnp.asarray(x),
            method=lambda m, a: m.encode_video(a, normalize=True, pool=False),
        )
    )
    feats = extract_cavp_features(
        args.video, encode, cavp_vars,
        start_second=args.start_second, truncate_second=args.truncate_second,
        size=args.frame_size or 224,
    )
    print(f"CAVP features: {feats.shape}")

    if args.bf16:
        params = {"unet": cast_floating(params["unet"]), "cond": params["cond"]}

    classifier = None
    if args.cg_scale > 0:
        if is_native_logdir(args.classifier_ckpt):
            from ..utils.checkpoint import load_native_classifier

            trainer, cparams, _ = load_native_classifier(args.classifier_ckpt)
            clf, clf_params = trainer.backbone, cparams["backbone"]
        elif args.classifier_ckpt:
            from ..utils.checkpoint import load_reference_classifier

            clf = ClassifierBackbone(CLASSIFIER_BACKBONE)
            cp = load_reference_classifier(args.classifier_ckpt)
            clf_params = cp["backbone"]
        else:
            clf = ClassifierBackbone(CLASSIFIER_BACKBONE)
            clf_params = jax.jit(lambda k: clf.init(
                k, jnp.zeros((1, 16, 64, 4)),
                jnp.zeros((1,)), jnp.zeros((1, 40, 512)),
            ))(jax.random.PRNGKey(3))
        # guidance context = raw CAVP feats (alignment_classifier.py:285-287)
        classifier = (clf.apply, clf_params)

    pipe = DiffFoleyPipeline(ldm, params, vae_params, classifier=classifier,
                             vae_dtype="bfloat16" if args.bf16 else None)
    sampler = args.sampler
    if args.continue_from and sampler not in ("ddim", "ancestral"):
        print(f"--continue-from needs a masked-capable sampler; "
              f"{sampler!r} -> 'ddim'")
        sampler = "ddim"
    gen = GenerationConfig(
        sampler=sampler, steps=args.steps, cfg_scale=args.cfg_scale,
        classifier_scale=args.cg_scale, sample_num=args.sample_num,
    )
    if args.continue_from:
        out = _continue_audio(pipe, feats, args, gen)
    else:
        out = pipe.generate(feats, jax.random.PRNGKey(args.seed + 5), gen)

    os.makedirs(args.out, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.video))[0]
    for i in range(out["wav"].shape[0]):
        path = os.path.join(args.out, f"{base}_sample{i}.wav")
        write_wav(path, out["wav"][i], sr=16000)
        np.save(os.path.join(args.out, f"{base}_sample{i}_spec.npy"),
                out["spec"][i])
        print("wrote", path)


if __name__ == "__main__":
    main()
