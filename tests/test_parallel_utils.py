"""Mesh utility coverage: replication consistency checker on the CPU mesh."""

import jax
import jax.numpy as jnp
import pytest

from adm_tpu.parallel.mesh import (
    check_replication_consistency,
    make_mesh,
    replicated_sharding,
)


def test_replication_consistency_passes(devices):
    mesh = make_mesh()
    tree = {"w": jnp.ones((16, 16)), "b": jnp.zeros((16,))}
    tree = jax.device_put(tree, replicated_sharding(mesh))
    check_replication_consistency(tree)  # must not raise


def test_replication_consistency_detects_divergence(devices):
    """Build a deliberately device-varying array and catch it."""
    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    # a data-sharded array has different shard contents; the checker only
    # inspects multi-shard leaves, so feed it one disguised as replicated
    x = jnp.arange(16.0).reshape(16, 1)
    sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    with pytest.raises(AssertionError):
        check_replication_consistency({"x": sharded})
