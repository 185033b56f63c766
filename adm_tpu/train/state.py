"""TrainState: one pytree carrying everything the reference checkpoints
({step, model, opt, lr_scheduler, ema, scaler} — train_uncond_dpm.py:211-220)
plus the latent scale_factor buffer (train_uncond_ldm.py:206-207).

The EMA lives ON DEVICE inside the jitted train step — unlike the reference,
which keeps a rank-0 CPU copy updated outside the step (train_uncond_dpm.py:
308-310). Decay warmup matches ddm/ema.py:132-139:
  decay(step) = clamp(1 - (1 + max(step - after - 1, 0)/inv_gamma)^(-power),
                      min_value, beta)
applied every `update_every` steps, with copy-through before
`update_after_step`.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EmaConfig:
    beta: float = 0.9996
    update_after_step: int = 10000
    update_every: int = 8
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any
    ema_params: Any
    scale_factor: jnp.ndarray  # scalar f32; 1.0 unless latent std-rescaling

    @classmethod
    def create(cls, params, opt_state, scale_factor: float = 1.0):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            scale_factor=jnp.asarray(scale_factor, jnp.float32),
        )


def ema_decay(step: jnp.ndarray, cfg: EmaConfig) -> jnp.ndarray:
    """Warmup decay schedule (ddm/ema.py:132-139); 0 before the gate.

    The reference returns 0 for epoch <= 0 BEFORE the min_value clamp
    (get_current_decay's early return), so the epoch-0 call must yield 0
    even when min_value > 0 — gating on `epoch <= 0`, not on the clipped
    value (code-review r4; identical for the shipped min_value=0 configs).
    """
    epoch = jnp.maximum(step.astype(jnp.float32) - cfg.update_after_step - 1, 0.0)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def ema_update(state: TrainState, cfg: EmaConfig) -> Any:
    """Device-side EMA: folded into the train step; returns new ema_params.

    Mirrors ddm/ema.py update() EXACTLY (twin-training-harness verified,
    tools/twin_train.py): the reference calls EMA.update() AFTER the trainer
    increments its step, and the EMA's internal counter counts PRIOR calls —
    so at trainer step k the gating/decay step is k-1
    (train_uncond_dpm.py:306-310 + ddm/ema.py:141-156). Only acts when
    (k-1) % update_every == 0, copies through while (k-1) <= after, and —
    because `initted` is only set OUTSIDE the warmup branch — the FIRST
    post-warmup update also copies (ddm/ema.py:150-153) before lerping
    params into params (a no-op lerp), i.e. it is a pure copy too.
    """
    step = state.step - 1  # the reference EMA's internal counter at this call
    # ... but update() increments the counter BEFORE update_moving_average
    # computes get_current_decay() (ddm/ema.py:141-143,132), so the decay is
    # evaluated at step+1 while the gates use step
    decay = ema_decay(state.step, cfg)
    do_update = (step % cfg.update_every) == 0
    # first update past the gate: the previous update step (step -
    # update_every) was still inside the warmup window, so the reference's
    # initted flag is unset and it copies instead of lerping
    first_post = (step > cfg.update_after_step) & (
        step - cfg.update_every <= cfg.update_after_step
    )
    decay = jnp.where(first_post, 0.0, decay)
    eff = jnp.where(do_update, decay, 1.0)

    def lerp(e, p):
        return e * eff + p.astype(e.dtype) * (1.0 - eff)

    return jax.tree_util.tree_map(lerp, state.ema_params, state.params)
