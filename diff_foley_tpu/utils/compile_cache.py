"""Persistent XLA compilation cache.

Flagship programs (25-step guided sampler) take tens of minutes to compile
over a remote-compile TPU link; the persistent cache makes every process
after the first start instantly. Enabled by default from bench.py and the
CLIs; override the location with DFT_COMPILE_CACHE.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/diff_foley_tpu/xla")


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("DFT_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
