"""Fused GN->SiLU->conv3x3 Pallas kernel: interpret-mode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.pallas.fused_block import (
    fused_gn_silu_conv3x3,
    gn_silu_conv3x3_reference,
)


@pytest.mark.parametrize("cin,cout,groups", [(64, 64, 8), (32, 64, 4)])
def test_fused_block_matches_reference(cin, cout, groups, rng):
    x = jax.random.normal(rng, (2, 8, 8, cin))
    gs = jax.random.normal(jax.random.PRNGKey(1), (cin,)) * 0.1 + 1
    gb = jax.random.normal(jax.random.PRNGKey(2), (cin,)) * 0.1
    ck = jax.random.normal(jax.random.PRNGKey(3), (3, 3, cin, cout)) * 0.05
    cb = jax.random.normal(jax.random.PRNGKey(4), (cout,)) * 0.1
    y_p = fused_gn_silu_conv3x3(x, gs, gb, ck, cb, groups=groups, interpret=True)
    y_r = gn_silu_conv3x3_reference(x, gs, gb, ck, cb, groups=groups)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=5e-3)


def test_fused_block_per_sample_affine(rng):
    """Per-sample (B, C) affine — the adaptive scale/shift fold-in."""
    x = jax.random.normal(rng, (2, 8, 8, 32))
    gs = jax.random.normal(jax.random.PRNGKey(1), (2, 32)) * 0.1 + 1
    gb = jax.random.normal(jax.random.PRNGKey(2), (2, 32)) * 0.1
    ck = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 32, 32)) * 0.05
    cb = jnp.zeros((32,))
    y = fused_gn_silu_conv3x3(x, gs, gb, ck, cb, groups=4, interpret=True)
    # per-sample reference
    outs = []
    for i in range(2):
        yi = gn_silu_conv3x3_reference(
            x[i : i + 1], gs[i], gb[i], ck, cb, groups=4
        )
        outs.append(yi)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.concatenate(outs)), atol=5e-3
    )
