"""FID: on-device feature statistics + Frechet distance.

Math match of reference metrics/metric_fid.py:27-114, computed in JAX:
  FID = |mu1 - mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2))

sqrtm of the (non-symmetric) product is evaluated on device via the
symmetric reformulation tr sqrtm(S1 S2) = sum sqrt(eigvalsh(A S2 A)) with
A = sqrtm(S1) from an eigendecomposition — no scipy/host roundtrip
(reference shells out to scipy.linalg.sqrtm on CPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_stats(feats: Array) -> Tuple[Array, Array]:
    """(N, D) features -> (mu (D,), sigma (D, D)) with unbiased covariance
    (reference metric_fid.py:84-87 uses np.cov, ddof=1)."""
    feats = feats.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    mu = jnp.mean(feats, axis=0)
    x = feats - mu
    sigma = x.T @ x / (feats.shape[0] - 1)
    return mu, sigma


def _psd_sqrt(s: Array, eps: float = 1e-12) -> Array:
    w, v = jnp.linalg.eigh(s)
    w = jnp.maximum(w, eps)
    return (v * jnp.sqrt(w)) @ v.T


def frechet_distance(mu1: Array, sigma1: Array, mu2: Array, sigma2: Array,
                     eps: float = 1e-6) -> Array:
    """reference metric_fid.py:27-72 (with its eps regularization)."""
    a = _psd_sqrt(sigma1 + eps * jnp.eye(sigma1.shape[0]))
    m = a @ (sigma2 + eps * jnp.eye(sigma2.shape[0])) @ a
    w = jnp.linalg.eigvalsh(m)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))
    diff = mu1 - mu2
    return (
        jnp.dot(diff, diff)
        + jnp.trace(sigma1)
        + jnp.trace(sigma2)
        - 2.0 * tr_sqrt
    )


def compute_fid(feats1: Array, feats2: Array) -> Array:
    mu1, s1 = feature_stats(feats1)
    mu2, s2 = feature_stats(feats2)
    return frechet_distance(mu1, s1, mu2, s2)
