"""Inception Score: split-KL on softmax of unbiased logits
(reference metrics/metric_isc.py:11-35)."""

from __future__ import annotations

import jax.numpy as jnp


def inception_score(logits_unbiased, splits: int = 10):
    """logits (N, C) -> (mean, std) of exp(E KL(p(y|x) || p(y))) per split."""
    n = logits_unbiased.shape[0]
    # guard tiny N (n < splits would create empty splits -> NaN); for the
    # reference's N >= splits regime this is the identity
    splits = max(1, min(splits, n))
    scores = []
    for i in range(splits):
        part = logits_unbiased[i * n // splits : (i + 1) * n // splits]
        log_prob = part - jnp.max(part, axis=1, keepdims=True)
        log_prob = log_prob - jnp.log(
            jnp.sum(jnp.exp(log_prob), axis=1, keepdims=True)
        )
        prob = jnp.exp(log_prob)
        log_mean = jnp.log(jnp.mean(prob, axis=0, keepdims=True))
        kl = jnp.sum(prob * (log_prob - log_mean), axis=1)
        scores.append(jnp.exp(jnp.mean(kl)))
    scores = jnp.stack(scores)
    return jnp.mean(scores), jnp.std(scores)
