"""fused_leaky_relu: bias-add + leaky ReLU + sqrt(2) gain.

The reference ships a CUDA kernel with custom double-backward
(unet/op/fused_bias_act.cu, unet/op/fused_act.py:20-97); on TPU the whole
op is a trivial XLA fusion, so this is a named jax function (autodiff gives
the same gradients, including double-backward, for free).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def fused_leaky_relu(
    x: Array,
    bias: Optional[Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> Array:
    """NHWC; bias broadcasts over the channel (last) axis."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale
