"""Resilience utilities and LR schedule shapes."""
import os
import signal
import time

import numpy as np

from diff_foley_tpu.utils.lr_schedules import (
    const_lr,
    const_lr_cooldown,
    cosine_with_warmup,
    lambda_linear,
    lambda_warmup_cosine,
)
from diff_foley_tpu.utils.resilience import (
    BackgroundSync,
    PreemptionCheckpointer,
    checkpoint_on_exception,
)


def test_schedules_values():
    s = lambda_linear(1e-4, warm_up_steps=10, f_start=0.0)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(10000)), 1e-4, rtol=1e-3)

    s = cosine_with_warmup(8e-4, 200, 1000)
    assert float(s(0)) < 1e-5
    np.testing.assert_allclose(float(s(200)), 8e-4, rtol=0.02)
    assert float(s(999)) < 1e-5

    s = const_lr(1e-3, warmup_steps=5)
    np.testing.assert_allclose(float(s(100)), 1e-3)

    s = const_lr_cooldown(1e-3, 5, 100, 20)
    np.testing.assert_allclose(float(s(50)), 1e-3)
    assert float(s(99)) < 1e-4

    s = lambda_warmup_cosine(1.0, 10, 0.1, 1.0, 0.0, 100)
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=0.1)
    np.testing.assert_allclose(float(s(100)), 0.1, rtol=0.05)


def test_preemption_checkpointer():
    pc = PreemptionCheckpointer(also_sigterm=False)
    assert not pc.should_checkpoint
    os.kill(os.getpid(), signal.SIGUSR1)
    time.sleep(0.05)
    assert pc.should_checkpoint
    pc.clear()
    assert not pc.should_checkpoint


def test_checkpoint_on_exception():
    saved = []

    @checkpoint_on_exception(lambda: saved.append(True))
    def boom():
        raise RuntimeError("x")

    try:
        boom()
    except RuntimeError:
        pass
    assert saved == [True]


def test_background_sync(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    sync = BackgroundSync(str(src), str(dst), interval_s=600).start()
    (src / "b.txt").write_text("world")
    sync.stop(final_sync=True)
    assert (dst / "a.txt").read_text() == "hello"
    assert (dst / "b.txt").read_text() == "world"
