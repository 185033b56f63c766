"""Device mesh + sharding helpers — the GSPMD replacement for the
reference's accelerate/DDP/NCCL layer (SURVEY.md section 2.11).

One mesh with axes ('data', 'model'):
  * 'data'  — batch sharding; the only axis the reference's capability set
    needs (its sole parallelism is DDP).
  * 'model' — reserved, size 1 by default; lets tensor-parallel shardings be
    added later without API change (SURVEY.md section 5.7).

Collectives are inserted by XLA from sharding annotations: gradients and
metrics reduce over ICI exactly where DDP used NCCL allreduce. There are no
explicit barriers — dispatch order plus block_until_ready at checkpoint
points replaces `accelerator.wait_for_everyone()`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build the ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def assert_shape(x, shape) -> None:
    """Shape guard (torch_utils/misc.py:96 equivalent); None = any size."""
    if x.ndim != len(shape):
        raise AssertionError(f"rank {x.ndim} != expected {len(shape)}")
    for i, (a, b) in enumerate(zip(x.shape, shape)):
        if b is not None and a != b:
            raise AssertionError(f"dim {i}: {a} != expected {b} (shape {x.shape})")


def check_replication_consistency(tree, atol: float = 0.0) -> None:
    """Verify replicated params are bitwise-identical on every device —
    the GSPMD analogue of check_ddp_consistency (torch_utils/misc.py:195-209).
    """
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.allclose(ref, np.asarray(s.data), atol=atol, rtol=0):
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                raise AssertionError(
                    f"replicated leaf '{name}' differs across devices"
                )


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Non-numeric fields (img_name strings, ori_size tuples from the test
    datasets) are DROPPED — they cannot enter a jitted step; read them from
    the host batch before sharding.

    Multi-process (multi-host DCN): each process holds its LOCAL slice of
    the global batch (the per-process dataloader shard, replacing the
    reference's DistributedSampler + DDP, torch_utils/distributed.py:14-41);
    jax.make_array_from_process_local_data assembles the global array. The
    single-process fast path is a plain device_put.
    """
    batch = _numeric_only(batch)
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return global_shard_batch(mesh, batch)


def _numeric_only(batch):
    if not isinstance(batch, dict):
        return batch
    return {
        k: v
        for k, v in batch.items()
        if not isinstance(v, (str, list))
        and np.asarray(v).dtype.kind not in ("U", "S", "O")
    }


def global_shard_batch(mesh: Mesh, batch):
    """Assemble per-process local batch slices into global sharded arrays.

    Local arrays must be the process's contiguous slice of the global batch:
    global batch size = local * process_count. Works single-process too
    (exercised on the CPU test mesh), where local == global.
    """
    sh = data_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
