"""Device-time attribution for the flagship UNet forward (round-2 VERDICT
weak #3 / directive #2a): capture a jax profiler trace of the bf16+Pallas
UNet at the headline operating point, parse the XSpace protobuf, and commit
the top fusions by % device time as PROFILE_r05.json.

Run ON the TPU, quiet machine:  python scripts/profile_unet.py
"""
import dataclasses
import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from diff_foley_tpu.diffusion.latent_diffusion import LatentDiffusion, LDMConfig
from diff_foley_tpu.ops.attention import set_attention_backend
from diff_foley_tpu.utils.compile_cache import enable_compile_cache
from diff_foley_tpu.utils.precision import cast_floating

BATCH = 16
CHAIN = 10


def capture_trace(tmpdir: str):
    set_attention_backend("pallas")
    ldm = LatentDiffusion(
        LDMConfig(unet=dataclasses.replace(LDMConfig().unet, dtype="bfloat16"))
    )
    params = jax.jit(ldm.init_params)(jax.random.PRNGKey(0))
    unet_params = cast_floating(params["unet"])

    x = jnp.zeros((BATCH, 16, 64, 4), jnp.bfloat16)
    t = jnp.zeros((BATCH,), jnp.float32)
    ctx = jnp.zeros((BATCH, 40, 768), jnp.bfloat16)

    fwd = jax.jit(lambda p, x_, t_, c_: ldm.unet.apply(p, x_, t_, c_))
    # warm up / compile outside the trace
    out = fwd(unet_params, x, t, ctx)
    _ = float(jnp.asarray(out, jnp.float32).sum())

    jax.profiler.start_trace(tmpdir)
    y = x
    for _ in range(CHAIN):
        y = fwd(unet_params, y, t, ctx).astype(jnp.bfloat16)
    _ = float(jnp.asarray(y, jnp.float32).sum())
    jax.profiler.stop_trace()


def parse_xspace(path: str):
    """Aggregate per-op self time from the device plane of an XSpace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    result = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = {m.id: m for m in plane.event_metadata.values()}
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        per_line = {}
        for line in plane.lines:
            agg = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                agg[name][0] += ev.duration_ps
                agg[name][1] += 1
            per_line[line.name or str(line.id)] = agg
        result[plane.name] = {"lines": per_line, "stat_meta": stat_meta,
                              "meta": meta}
    return result


def main():
    enable_compile_cache()
    tmpdir = "/tmp/diff_foley_xprof"
    os.makedirs(tmpdir, exist_ok=True)
    capture_trace(tmpdir)
    paths = sorted(glob.glob(tmpdir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane.pb under {tmpdir}"
    parsed = parse_xspace(paths[-1])

    record = {
        "operating_point": (
            f"flagship UNet fwd, batch {BATCH}, bf16 + Pallas attention, "
            f"{CHAIN} chained calls, one readback"
        ),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "planes": {},
    }

    def category(name: str) -> str:
        # "%fusion.123 = ..." → "fusion"; strip the instance suffix
        head = name.lstrip("%").split(" ", 1)[0]
        base = head.split(".", 1)[0]
        # pallas kernels surface as custom-call; call out separately
        if base == "custom-call" or "tpu_custom_call" in name:
            return "custom-call(pallas)"
        return base

    for pname, plane in parsed.items():
        lines = plane["lines"]
        # 'XLA Ops' = non-overlapping per-op self times on the compute
        # stream; 'Async XLA Ops' durations overlap DMA with compute and
        # would double-count.
        agg = lines.get("XLA Ops")
        if not agg:
            continue
        total = sum(v[0] for v in agg.values())
        if total == 0:
            continue
        cats = defaultdict(lambda: [0.0, 0])
        for name, (ps, cnt) in agg.items():
            c = cats[category(name)]
            c[0] += ps
            c[1] += cnt
        cat_top = sorted(cats.items(), key=lambda kv: -kv[1][0])
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:15]
        record["planes"][pname] = {
            "line": "XLA Ops",
            "total_ms": round(total / 1e9, 3),
            "per_call_ms": round(total / 1e9 / CHAIN, 3),
            "by_category": [
                {
                    "category": c,
                    "ms": round(ps / 1e9, 3),
                    "pct": round(100.0 * ps / total, 2),
                    "count": cnt,
                }
                for c, (ps, cnt) in cat_top
            ],
            "top_ops": [
                {
                    "name": name[:140],
                    "ms": round(ps / 1e9, 3),
                    "pct": round(100.0 * ps / total, 2),
                    "count": cnt,
                }
                for name, (ps, cnt) in top
            ],
        }

    out = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "PROFILE_r05.json"))
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2)[:4000])


if __name__ == "__main__":
    main()
