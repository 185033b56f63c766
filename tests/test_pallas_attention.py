"""small_seq_attention (VMEM-resident Pallas attention): fwd + VJP parity
against the fp32 einsum reference, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.pallas.attention import (
    attention_reference,
    small_seq_attention,
)


@pytest.mark.parametrize("s,d", [(64, 64), (256, 64), (64, 32)])
def test_forward_matches_reference(s, d, rng):
    b, h = 2, 3
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    out = small_seq_attention(q, k, v, scale, True)
    ref = attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference(rng):
    b, h, s, d = 2, 2, 64, 32
    kq, kk, kv, kt = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    tgt = jax.random.normal(kt, (b, h, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def loss_pallas(q, k, v):
        return jnp.sum((small_seq_attention(q, k, v, scale, True) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((attention_reference(q, k, v, scale) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4,
                                   rtol=1e-3)


def test_bfloat16_io(rng):
    b, h, s, d = 1, 2, 64, 64
    q = jax.random.normal(rng, (b, h, s, d), jnp.bfloat16)
    out = small_seq_attention(q, q, q, 0.125, True)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, q, q, 0.125)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_batch_sharded_execution(rng):
    """Under a data-sharded pjit the kernel must partition over the batch
    axis (custom_partitioning sharding rule), not replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from adm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    b, h, s, d = 8, 2, 64, 32
    q = jax.random.normal(rng, (b, h, s, d), jnp.float32)
    sh = NamedSharding(mesh, P("data"))
    qs = jax.device_put(q, sh)

    @jax.jit
    def run(q):
        return small_seq_attention(q, q, q, 0.125, True)

    out = run(qs)
    assert out.sharding.is_equivalent_to(sh, 4)
    ref = attention_reference(q, q, q, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients partition too
    @jax.jit
    def grad_run(q):
        return jax.grad(
            lambda v: jnp.sum(small_seq_attention(v, v, v, 0.125, True))
        )(q)

    g = grad_run(qs)
    assert g.shape == q.shape
    assert np.isfinite(np.asarray(g)).all()
