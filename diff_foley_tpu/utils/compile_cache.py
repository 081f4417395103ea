"""Persistent XLA compilation cache.

Flagship programs (25-step guided sampler) take tens of minutes to compile
over a remote-compile TPU link; the persistent cache makes every process
after the first start instantly. Enabled by default from bench.py and the
CLIs; override the location with DFT_COMPILE_CACHE.
"""
from __future__ import annotations

import hashlib
import os
import platform as _platform

_DEFAULT = os.path.expanduser("~/.cache/diff_foley_tpu/xla")


def host_cpu_fingerprint() -> str:
    """Short hash of this host's CPU feature flags.

    XLA:CPU persists AOT results whose cache key does NOT include the host's
    CPU features; an entry written on an AMX/AVX-512 machine and loaded on a
    host without those features warns "could lead to execution errors such
    as SIGILL".  Dev-tunnel hosts rotate, so CPU-backend cache dirs are
    namespaced by this fingerprint (TPU executables don't depend on the
    host CPU and keep one shared dir).
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.blake2b(
                        line.encode(), digest_size=4).hexdigest()
    except OSError:
        pass
    return _platform.machine() or "unknown"


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("DFT_COMPILE_CACHE", _DEFAULT)
    if jax.default_backend() == "cpu":
        path = os.path.join(path, f"cpu-{host_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
