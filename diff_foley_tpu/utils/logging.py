"""Metrics logging + throughput meters.

Replaces the reference's wandb/tensorboard/results.jsonl triad
(SURVEY.md §5 "Metrics / logging"): JSONL is primary (results.jsonl parity,
train_wds_intra_contrast.py:347-349), TensorBoard optional via tensorboardX,
stdout always.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "results",
                 use_tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{name}.jsonl")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict, prefix: str = "") -> None:
        payload = {("%s%s" % (prefix, k)): _to_py(v) for k, v in metrics.items()}
        payload["step"] = int(step)
        payload["time"] = time.time()
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(payload) + "\n")
        if self._tb is not None:
            for k, v in payload.items():
                if isinstance(v, (int, float)) and k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


class Meter:
    """Running average of step/data times and throughput
    (train_wds_intra_contrast.py:183-230 meters)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0
        self.last = 0.0

    def update(self, value: float, n: int = 1):
        self.last = value
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Stopwatch:
    def __init__(self):
        self.t = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self.t
        self.t = now
        return dt
