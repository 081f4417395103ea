"""LR schedules used by the two trainers.

- LambdaLinearScheduler (stage2 LDM: `adm/lr_scheduler.py:51-97`,
  `diff_foley_train.yaml:21-28`): linear warmup to f_max then constant f_min→
  actually linear interpolation towards f_min over cycle length; shipped
  config uses f_start 1e-6, f_max/f_min 1., warmup 1000 → constant 1 after
  warmup.
- cosine_lr (stage1 CAVP: `training/scheduler.py:13-53`): linear warmup then
  cosine decay to 0 over total steps.
"""
from __future__ import annotations

import optax


def lambda_linear(
    base_lr: float,
    warm_up_steps: int = 1000,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e10,
) -> optax.Schedule:
    cycle_length = float(cycle_length)

    def schedule(step):
        import jax.numpy as jnp

        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = f_start + (f_max - f_start) * (step / max(warm_up_steps, 1))
        after = f_min + (f_max - f_min) * (cycle_length - step) / cycle_length
        f = jnp.where(step < warm_up_steps, warm, after)
        return base_lr * f

    return schedule


def const_lr(base_lr: float, warmup_steps: int = 0) -> optax.Schedule:
    """Constant LR after linear warmup (scheduler.py:34-41)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, base_lr)

    return schedule


def const_lr_cooldown(
    base_lr: float, warmup_steps: int, total_steps: int, cooldown_steps: int,
    cooldown_power: float = 1.0, cooldown_end_lr: float = 0.0,
) -> optax.Schedule:
    """Constant LR with a polynomial cooldown tail (scheduler.py:44-53)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        start = total_steps - cooldown_steps
        frac = jnp.clip((total_steps - step) / max(cooldown_steps, 1), 0.0, 1.0)
        cooled = cooldown_end_lr + (base_lr - cooldown_end_lr) * frac**cooldown_power
        mid = jnp.where(step < start, base_lr, cooled)
        return jnp.where(step < warmup_steps, warm, mid)

    return schedule


def lambda_warmup_cosine(
    base_lr: float, warm_up_steps: int, lr_min: float, lr_max: float,
    lr_start: float, max_decay_steps: int,
) -> optax.Schedule:
    """LambdaWarmUpCosineScheduler (adm/lr_scheduler.py:4-48): multiplier
    warms lr_start→lr_max then cosine-decays to lr_min."""

    def schedule(step):
        import jax.numpy as jnp

        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip(
            (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1),
            0.0, 1.0,
        )
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def cosine_with_warmup(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        prog = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(prog, 0.0, 1.0))) * base_lr
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
