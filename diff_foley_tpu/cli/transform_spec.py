"""Batch mel-format interop CLI: a folder of generated specs → the
SpecVQGAN metric toolchain's format (or back).

Reference equivalent: `evaluation/transform_spec.py:93-130` — walks a folder
of .npy log-mel specs, converts each 128-mel/16 kHz spec to 80-mel/22.05 kHz
(`transform_spec:42-61`) for SpecVQGAN IS/FID/KL scoring
(`evaluation/readme.md:5-11`), with `--split/--node` folder sharding for
multi-node runs and a worker pool per node.

Usage:
  python -m diff_foley_tpu.cli.transform_spec --input generate_folder/ \
      --output save_folder/ [--direction to_specvqgan] \
      [--split 4 --node 1] [--workers 8]
"""
from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="folder of .npy specs")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--direction",
        choices=("to_specvqgan", "to_native"),
        default="to_specvqgan",
        help="to_specvqgan: 128-mel/16k → 80-mel/22.05k (reference default); "
        "to_native: the inverse",
    )
    # Multi-node folder sharding, same contiguous-chunk semantics as the
    # reference (transform_spec.py:116-127): node k of `split` takes
    # files [k*ceil(N/split), (k+1)*ceil(N/split)).
    p.add_argument("--split", type=int, default=1)
    p.add_argument("--node", type=int, default=0)
    p.add_argument("--workers", type=int, default=0,
                   help="process-pool size; 0 = in-process serial")
    return p.parse_args(argv)


def _convert_one(job):
    """Top-level so it pickles into worker processes."""
    import numpy as np

    from ..eval.spec_transform import spec_16k128_to_22k80, spec_22k80_to_16k128

    src, dst, direction = job
    try:
        spec = np.load(src)
        fn = spec_16k128_to_22k80 if direction == "to_specvqgan" else spec_22k80_to_16k128
        np.save(dst, fn(spec))
        return os.path.basename(src), True, ""
    except Exception as e:  # mirror the reference's per-file error capture (:81-83)
        return os.path.basename(src), False, str(e)


def main(argv=None):
    args = parse_args(argv)
    if not 0 <= args.node < args.split:
        raise SystemExit(f"--node {args.node} out of range for --split {args.split}")
    os.makedirs(args.output, exist_ok=True)

    names = sorted(f for f in os.listdir(args.input) if f.endswith(".npy"))
    # true ceil split (the reference's `len//split + 1` at :120 leaves
    # trailing nodes with ZERO files whenever len % split == 0)
    chunk = -(-len(names) // args.split) if names else 0
    names = names[args.node * chunk: min((args.node + 1) * chunk, len(names))]
    jobs = [
        (os.path.join(args.input, n), os.path.join(args.output, n), args.direction)
        for n in names
    ]

    if args.workers > 0 and len(jobs) > 1:
        # submit+as_completed rather than pool.map: if a worker process dies
        # (e.g. OOM on a huge .npy), map() raises BrokenProcessPool and loses
        # the whole per-file report; here the dead job becomes one failure
        # tuple and the rest of the report survives.
        from concurrent.futures import ProcessPoolExecutor, as_completed

        results = []
        with ProcessPoolExecutor(max_workers=args.workers) as pool:
            futs = {pool.submit(_convert_one, j): j for j in jobs}
            for fut in as_completed(futs):
                try:
                    results.append(fut.result())
                except Exception as e:
                    results.append(
                        (os.path.basename(futs[fut][0]), False, f"worker died: {e}")
                    )
    else:
        results = [_convert_one(j) for j in jobs]

    errs = [(n, msg) for n, ok, msg in results if not ok]
    print(f"converted {len(results) - len(errs)}/{len(results)} specs "
          f"({args.direction}, node {args.node}/{args.split})")
    for n, msg in errs:
        print(f"  FAILED {n}: {msg}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
