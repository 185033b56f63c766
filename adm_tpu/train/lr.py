"""LR schedule: linear warmup then polynomial decay with a floor.

Matches the reference's WarmUpLrScheduler lambda
(train_uncond_dpm.py:169-182):
  iter <= warmup : ratio = (iter+1)/warmup
  else           : ratio = max((1 - (iter-warmup)/total)^0.96, min_lr/lr)
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 5000,
    min_lr: float = 5e-6,
    power: float = 0.96,
):
    floor = min_lr / base_lr

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        frac = jnp.clip(1.0 - (count - warmup_steps) / total_steps, 0.0, 1.0)
        decay = jnp.maximum(frac**power, floor)
        if warmup_steps == 0:
            # the conditional trainer's lambda has NO warmup phase
            # (train_cond_dpm.py:183: max((1 - iter/total)^0.96, floor))
            return base_lr * decay
        warm = (count + 1) / warmup_steps
        ratio = jnp.where(count <= warmup_steps, warm, decay)
        return base_lr * ratio

    return schedule
