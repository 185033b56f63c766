"""Weight initializers matching the reference's four modes.

Reference unet/uncond_unet.py:42-47 defines:
  xavier_uniform : sqrt(6/(fan_in+fan_out)) * U(-1,1)
  xavier_normal  : sqrt(2/(fan_in+fan_out)) * N(0,1)
  kaiming_uniform: sqrt(3/fan_in) * U(-1,1)
  kaiming_normal : sqrt(1/fan_in) * N(0,1)

scaled by a per-layer `init_weight` / `init_bias` factor. fan_in/fan_out are
computed over the full receptive field (in_ch*k*k for convs), and — unlike
standard initializers — the reference applies the same *weight-shaped* fan
statistics to biases too, so we expose explicit fan arguments rather than
inferring them from the param shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_init(mode: str, scale: float, fan_in: int, fan_out: int):
    """Return a flax-style init fn (key, shape, dtype) -> array."""

    def init(key, shape, dtype=jnp.float32):
        if scale == 0.0:
            return jnp.zeros(shape, dtype)
        if mode == "xavier_uniform":
            w = jnp.sqrt(6.0 / (fan_in + fan_out)) * (
                jax.random.uniform(key, shape, dtype) * 2 - 1
            )
        elif mode == "xavier_normal":
            w = jnp.sqrt(2.0 / (fan_in + fan_out)) * jax.random.normal(
                key, shape, dtype
            )
        elif mode == "kaiming_uniform":
            w = jnp.sqrt(3.0 / fan_in) * (jax.random.uniform(key, shape, dtype) * 2 - 1)
        elif mode == "kaiming_normal":
            w = jnp.sqrt(1.0 / fan_in) * jax.random.normal(key, shape, dtype)
        else:
            raise ValueError(f"invalid init mode '{mode}'")
        return w * scale

    return init
