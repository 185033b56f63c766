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


def test_global_shard_batch_api(devices):
    """multi-host placement API on the 8-device mesh: sharded layout and
    content must match the device_put fast path (single-process, so local
    slice == global batch)."""
    import numpy as np
    from adm_tpu.parallel.mesh import (
        data_sharding,
        global_shard_batch,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh()
    batch = {"image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)}
    g = global_shard_batch(mesh, batch)
    f = shard_batch(mesh, batch)
    assert g["image"].sharding == data_sharding(mesh)
    assert g["image"].shape == (8, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(g["image"]), np.asarray(f["image"]))
    # each device holds exactly its batch slice
    assert len(g["image"].addressable_shards) == 8
