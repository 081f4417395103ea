"""Model profiler: parameters + FLOPs per model family.

Reference equivalent: `training/profile.py:18-158` (fvcore FLOP counting) —
here via XLA's own cost model (`jax.stages.Compiled.cost_analysis`).

Usage:
  python -m diff_foley_tpu.cli.profile [--family unet|vae|classifier|cavp|all]
      [--batch 1] [--time]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="all",
                   choices=["unet", "vae", "classifier", "cavp", "all"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--time", action="store_true",
                   help="also wall-clock each forward (runs on the device)")
    return p.parse_args(argv)


def _report(name, fn, params, *args, do_time=False):
    from ..utils.profiling import cost_analysis, timed_call

    n_params = sum(p.size for p in jax.tree.leaves(params))
    costs = cost_analysis(fn, params, *args)
    line = (f"{name:12s} params={n_params/1e6:9.1f}M "
            f"flops={costs['flops']/1e9:10.2f}G "
            f"bytes={costs['bytes_accessed']/1e6:9.1f}MB")
    if do_time:
        sec, _ = timed_call(jax.jit(fn), params, *args, iters=5)
        line += (f" time={sec*1000:8.2f}ms "
                 f"tflops/s={costs['flops']/sec/1e12:7.1f}")
    print(line)


def main(argv=None):
    args = parse_args(argv)
    b = args.batch
    fam = args.family

    if fam in ("unet", "all"):
        from ..models.unet import LDM_UNET, UNetModel

        unet = UNetModel(LDM_UNET)
        x = jnp.zeros((b, 16, 64, 4))
        t = jnp.zeros((b,))
        c = jnp.zeros((b, 40, 768))
        params = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, t, c)
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
        _report("unet", lambda p, *a: unet.apply(p, *a), params, x, t, c,
                do_time=args.time)

    if fam in ("vae", "all"):
        from ..models.vae import AutoencoderKL

        vae = AutoencoderKL()
        xs = jnp.zeros((b, 128, 512, 3))
        vp = jax.eval_shape(vae.init, jax.random.PRNGKey(0), xs)
        vp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vp)
        _report("vae.encode",
                lambda p, a: vae.apply(p, a, method=lambda m, q: m.encode(q).mode()),
                vp, xs, do_time=args.time)
        z = jnp.zeros((b, 16, 64, 4))
        _report("vae.decode",
                lambda p, a: vae.apply(p, a, method=lambda m, q: m.decode(q)),
                vp, z, do_time=args.time)

    if fam in ("classifier", "all"):
        from ..models.unet import CLASSIFIER_BACKBONE, ClassifierBackbone

        clf = ClassifierBackbone(CLASSIFIER_BACKBONE)
        x = jnp.zeros((b, 16, 64, 4))
        t = jnp.zeros((b,))
        c = jnp.zeros((b, 40, 512))
        cp = jax.eval_shape(clf.init, jax.random.PRNGKey(0), x, t, c)
        cp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cp)
        _report("classifier", lambda p, *a: clf.apply(p, *a), cp, x, t, c,
                do_time=args.time)

    if fam in ("cavp", "all"):
        from ..models.cavp import CAVPModel

        cavp = CAVPModel()
        v = jnp.zeros((b, 16, 224, 224, 3))
        s = jnp.zeros((b, 128, 256))
        import functools

        variables = jax.eval_shape(
            functools.partial(cavp.init, train=False),
            jax.random.PRNGKey(0), v, s,
        )
        variables = jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype), variables)
        _report("cavp", lambda p, a, b_: cavp.apply(p, a, b_), variables, v, s,
                do_time=args.time)


if __name__ == "__main__":
    main()
