"""AOT executable cache: near-instant process restarts for serving.

The persistent XLA compilation cache (utils/compile_cache.py) removes
recompiles but NOT the jax trace+lower cost, and for the serving
pipeline's fused program (25-step guided sampler over the 860M UNet + VAE
decode + Griffin-Lim) tracing DOMINATES a warm restart: measured on the
v5e, the 16-window bucket costs 457.8 s to trace+lower vs 4.2 s to
"compile" against a hot XLA cache (SERVING_r04.json attribution).

`jax.experimental.serialize_executable` skips both: the loaded executable
is pickled once, and a restart deserializes it straight onto the device —
no tracing, no lowering, no compile. Executables are specific to the
jaxlib version and device kind, so entries are keyed on both and every
load failure falls back silently to the jit path (the cache is an
optimisation, never a correctness dependency).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax

_DEFAULT = os.path.expanduser("~/.cache/diff_foley_tpu/aot")

_CODE_FP: Optional[str] = None


def _code_fingerprint() -> str:
    """blake2 over the package's .py sources. Serialized executables bake
    in the traced program, so a code upgrade that changes the lowering
    (a new kernel, a different fusion boundary) must invalidate the cache
    — otherwise a restart silently serves the OLD program: functionally
    identical (both paths compute the same math) but performance-stale.
    Computed once per process (~ms); misses fall back to jit, where the
    content-addressed XLA compile cache still hits for unchanged HLO."""
    global _CODE_FP
    if _CODE_FP is None:
        import diff_foley_tpu

        root = os.path.dirname(diff_foley_tpu.__file__)
        h = hashlib.blake2b(digest_size=8)
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                p = os.path.join(dirpath, name)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
        _CODE_FP = h.hexdigest()
    return _CODE_FP


def aot_cache_dir(path: Optional[str] = None) -> str:
    path = path or os.environ.get("DFT_AOT_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    return path


def cache_key(tag: str, **parts: Any) -> str:
    """Stable filename: tag + blake2 of the identifying parts + platform."""
    ident = repr(sorted(parts.items()))
    dev = jax.devices()[0]
    env = (f"{jax.__version__}-{getattr(dev, 'device_kind', dev.platform)}"
           f"-{_code_fingerprint()}")
    if dev.platform == "cpu":
        # XLA:CPU executables bake in host ISA features (AMX/AVX-512 …);
        # loading one on a lesser host can SIGILL, which no try/except can
        # catch. Namespace CPU entries by the host fingerprint.
        from .compile_cache import host_cpu_fingerprint

        env += f"-{host_cpu_fingerprint()}"
    h = hashlib.blake2b(f"{ident}|{env}".encode(), digest_size=12).hexdigest()
    return f"{tag}-{h}.aot"


def save_executable(path: str, compiled) -> None:
    """Serialize a jax `Compiled` to disk (atomic write).

    The executable's device ASSIGNMENT is stored alongside the payload:
    without it, `deserialize_and_load` rebinds to ALL local devices, which
    breaks any process whose device count differs from the executable's
    (e.g. a 1-device program restored on an 8-device host)."""
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    dev_ids = [
        d.id for d in compiled._executable.xla_executable.local_devices()
    ]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump((payload, in_tree, out_tree, dev_ids), f)
    os.replace(tmp, path)


def load_executable(path: str) -> Optional[Callable]:
    """Deserialize + device-load a pickled executable, pinned to the saved
    device assignment; None on ANY failure (wrong jaxlib, wrong device,
    missing device ids, corrupt file — callers fall back to jit)."""
    from jax.experimental import serialize_executable as se

    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree, dev_ids = pickle.load(f)
        by_id = {d.id: d for d in jax.devices()}
        devices = [by_id[i] for i in dev_ids]  # KeyError → fall back to jit
        return se.deserialize_and_load(
            payload, in_tree, out_tree, execution_devices=devices)
    except FileNotFoundError:
        return None
    except Exception:  # noqa: BLE001 — never let a stale cache kill serving
        return None
