"""Perceptual Path Length (reference metrics/metric_ppl.py:15, noise.py:24-42,
sample_similarity_lpips.py:85).

PPL = E[ d_lpips(G(slerp(z0, z1, t)), G(slerp(z0, z1, t+eps))) / eps^2 ]
with 1st/99th-percentile trimming, computed on device with our LPIPS.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def slerp(a: Array, b: Array, t) -> Array:
    """Spherical interpolation over flattened latents (metrics/noise.py:24-42)."""
    shape = a.shape
    af = a.reshape(a.shape[0], -1)
    bf = b.reshape(b.shape[0], -1)
    an = af / jnp.linalg.norm(af, axis=-1, keepdims=True)
    bn = bf / jnp.linalg.norm(bf, axis=-1, keepdims=True)
    d = jnp.sum(an * bn, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1 + 1e-7, 1 - 1e-7))
    c = bn - d * an
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = af * jnp.cos(p) + jnp.linalg.norm(af, axis=-1, keepdims=True) * jnp.sin(
        p
    ) * c
    return out.reshape(shape)


def perceptual_path_length(
    generator: Callable[[Array], Array],  # latent -> image in [0,1]
    perceptual_fn: Callable[[Array, Array], Array],
    key: Array,
    latent_shape,
    num_samples: int = 1024,
    batch_size: int = 64,
    epsilon: float = 1e-4,
) -> dict:
    dists = []
    n_batches = num_samples // batch_size
    for i in range(n_batches):
        key, k0, k1, kt = jax.random.split(key, 4)
        z0 = jax.random.normal(k0, (batch_size, *latent_shape))
        z1 = jax.random.normal(k1, (batch_size, *latent_shape))
        t = jax.random.uniform(kt, (batch_size, 1))
        za = slerp(z0, z1, t)
        zb = slerp(z0, z1, t + epsilon)
        img_a = generator(za) * 2 - 1
        img_b = generator(zb) * 2 - 1
        d = perceptual_fn(img_a, img_b) / (epsilon**2)
        dists.append(np.asarray(d))
    dists = np.concatenate(dists)
    lo, hi = np.percentile(dists, [1, 99])
    kept = dists[(dists >= lo) & (dists <= hi)]
    return {"ppl_mean": float(kept.mean()), "ppl_std": float(kept.std()),
            "num_kept": int(kept.size)}
