"""conv3x3_same (K-packed Pallas conv): fwd + VJP parity against
jax.lax.conv_general_dilated, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.pallas.conv3x3 import _xla_conv, conv3x3_same


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [
        (4, 8, 8, 16, 16),       # tiny, sb covers whole batch
        (2, 6, 10, 32, 24),      # non-square, cin != cout
        (8, 4, 4, 192, 192),     # flagship channel width (4C lane-aligned)
        (3, 5, 7, 8, 8),         # odd batch/spatial
    ],
)
def test_forward_matches_xla(b, h, w, cin, cout, rng):
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1
    out = conv3x3_same(x, wt, True)
    ref = _xla_conv(x, wt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradients_match_xla(rng):
    b, h, w, cin, cout = 2, 6, 6, 24, 16
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1

    def loss_pallas(x_, w_):
        return jnp.sum(jnp.sin(conv3x3_same(x_, w_, True)))

    def loss_ref(x_, w_):
        return jnp.sum(jnp.sin(_xla_conv(x_, w_)))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, wt)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, wt)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
        )


def test_bfloat16_io(rng):
    b, h, w, c = 2, 8, 8, 32
    x = jax.random.normal(rng, (b, h, w, c), jnp.bfloat16)
    wt = jnp.ones((3, 3, c, c), jnp.bfloat16) * 0.05
    out = conv3x3_same(x, wt, True)
    assert out.dtype == jnp.bfloat16
    ref = _xla_conv(x, wt)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_batch_sharded_execution(rng):
    """Under a data-sharded pjit the kernel must partition over the batch
    axis (custom_partitioning sharding rule), not replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    b, h, w, c = 8, 4, 4, 16
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (b, h, w, c), jnp.float32)
    wt = jax.random.normal(kw, (3, 3, c, c), jnp.float32) * 0.1
    sh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(x, sh)

    @jax.jit
    def run(x_, w_):
        return conv3x3_same(x_, w_, True)

    out = run(xs, wt)
    assert out.sharding.is_equivalent_to(sh, 4)
    ref = _xla_conv(x, wt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
