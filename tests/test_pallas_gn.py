"""Fused GroupNorm+SiLU Pallas kernel: fwd/bwd parity in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.pallas.groupnorm import (
    fused_groupnorm_silu,
    groupnorm_silu_reference,
)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 8), ((3, 4, 4, 32), 4)])
def test_forward_matches_reference(shape, groups, rng):
    x = jax.random.normal(rng, shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.1 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.1
    y_p = fused_groupnorm_silu(x, scale, bias, groups, 1e-5, True)
    y_r = groupnorm_silu_reference(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=1e-5)


def test_gradients_match_reference(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    scale = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.1 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1

    gp = jax.grad(
        lambda *a: jnp.sum(fused_groupnorm_silu(*a, 8, 1e-5, True) ** 2),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    gr = jax.grad(
        lambda *a: jnp.sum(groupnorm_silu_reference(*a, 8) ** 2), argnums=(0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_per_sample_affine(rng):
    """(B, C) scale/bias covers the adaptive scale/shift fold-in."""
    x = jax.random.normal(rng, (2, 8, 8, 64))
    scale = jax.random.normal(jax.random.PRNGKey(1), (2, 64)) * 0.1 + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (2, 64)) * 0.1
    y = fused_groupnorm_silu(x, scale, bias, 8, 1e-5, True)
    # reference computed per-sample
    xg = x.reshape(2, 8, 8, 8, 8).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xhat = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(2, 8, 8, 64)
    z = xhat * scale[:, None, None, :] + bias[:, None, None, :]
    expect = z * jax.nn.sigmoid(z)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=1e-5)
    g = jax.grad(
        lambda s: jnp.sum(fused_groupnorm_silu(x, s, bias, 8, 1e-5, True) ** 2)
    )(scale)
    assert g.shape == (2, 64)
