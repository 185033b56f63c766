"""KID: polynomial-kernel unbiased MMD^2 over random subsets
(reference metrics/metric_kid.py:16-119)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _poly_kernel(x: Array, y: Array, degree: int = 3, gamma=None, coef0: float = 1.0):
    d = x.shape[1]
    g = (1.0 / d) if gamma is None else gamma
    return (x @ y.T * g + coef0) ** degree


def mmd2_unbiased(kxx: Array, kyy: Array, kxy: Array) -> Array:
    m = kxx.shape[0]
    sum_xx = (jnp.sum(kxx) - jnp.trace(kxx)) / (m * (m - 1))
    sum_yy = (jnp.sum(kyy) - jnp.trace(kyy)) / (m * (m - 1))
    sum_xy = jnp.mean(kxy)
    return sum_xx + sum_yy - 2 * sum_xy


def kernel_inception_distance(
    feats1: Array,
    feats2: Array,
    key: Array,
    subsets: int = 100,
    subset_size: int = 1000,
):
    """Returns (mean, std) of unbiased MMD^2 across random subsets."""
    n1, n2 = feats1.shape[0], feats2.shape[0]
    size = min(subset_size, n1, n2)
    vals = []
    for i in range(subsets):
        k1, k2, key = jax.random.split(key, 3)
        i1 = jax.random.choice(k1, n1, (size,), replace=False)
        i2 = jax.random.choice(k2, n2, (size,), replace=False)
        x, y = feats1[i1], feats2[i2]
        vals.append(
            mmd2_unbiased(_poly_kernel(x, x), _poly_kernel(y, y), _poly_kernel(x, y))
        )
    vals = jnp.stack(vals)
    return jnp.mean(vals), jnp.std(vals)
