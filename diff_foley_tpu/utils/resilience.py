"""Crash resilience: preemption checkpointing + background artifact sync.

Behavioural spec: reference SIGUSR1 'melk' handler + checkpoint-on-exception
(`stage2_ldm/main.py:614-636`) and the background `aws s3 sync` process
(`training/file_utils.py:30-60`). No cloud creds in this environment, so the
sync target is any path/URI handled by a user hook (default: local rsync-ish
copy), preserving the 'keep a remote copy fresh every N seconds' semantics.
"""
from __future__ import annotations

import os
import shutil
import signal
import threading
import time
from typing import Callable, Optional


class PreemptionCheckpointer:
    """Install SIGUSR1/SIGTERM handlers that request a checkpoint; the train
    loop polls `should_checkpoint` (the jax-friendly version of 'melk')."""

    def __init__(self, also_sigterm: bool = True):
        self._flag = threading.Event()
        signal.signal(signal.SIGUSR1, self._handler)
        if also_sigterm:
            signal.signal(signal.SIGTERM, self._handler)

    def _handler(self, signum, frame):
        self._flag.set()

    @property
    def should_checkpoint(self) -> bool:
        return self._flag.is_set()

    def clear(self):
        self._flag.clear()


def checkpoint_on_exception(save_fn: Callable[[], None]):
    """Decorator: run fn, checkpoint before re-raising (main.py:631-636)."""

    def deco(fn):
        def wrapped(*a, **k):
            try:
                return fn(*a, **k)
            except Exception:
                try:
                    save_fn()
                finally:
                    raise

        return wrapped

    return deco


class BackgroundSync:
    """Periodically mirror a local directory to a destination
    (file_utils.py:30-60 semantics; `copy_fn` pluggable for object stores)."""

    def __init__(
        self,
        src: str,
        dst: str,
        interval_s: float = 300.0,
        copy_fn: Optional[Callable[[str, str], None]] = None,
    ):
        self.src, self.dst = src, dst
        self.interval = interval_s
        self.copy_fn = copy_fn or self._local_copy
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _local_copy(src: str, dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        shutil.copytree(src, dst, dirs_exist_ok=True)

    def _loop(self):
        while not self._stop.wait(self.interval):
            try:
                self.copy_fn(self.src, self.dst)
            except Exception as e:  # keep syncing on transient failures
                print(f"[BackgroundSync] {e}")

    def start(self):
        self._thread.start()
        return self

    def stop(self, final_sync: bool = True):
        # join BEFORE the final sync: a concurrent in-flight copy of the
        # same tree could interleave truncate/write on the same dst files
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=30)
        if final_sync:
            try:
                self.copy_fn(self.src, self.dst)
            except Exception as e:  # same tolerance as the loop
                print(f"[BackgroundSync] final sync failed: {e}")
