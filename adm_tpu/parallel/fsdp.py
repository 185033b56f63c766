"""Fully-sharded data parallelism (ZeRO-3 style) over the 'data' mesh axis
— optional, beyond-reference capability (the reference's only parallelism
is DDP with fully replicated params, accelerate/DDP per SURVEY.md §2.11).

GSPMD formulation: each large parameter leaf is sharded along one weight
dimension over 'data'; optimizer moments and the EMA copy inherit the same
spec (their pytrees mirror the params). XLA then inserts, per step:

  all-gather   (param, on first use in fwd; re-gathered in bwd)
  reduce-scatter (grad, replacing DP's all-reduce)

so per-device memory for params+Adam mu/nu+EMA drops ~n_data-fold while
the batch stays sharded on the same axis — the standard FSDP/ZeRO-3
schedule, expressed purely as sharding annotations (no manual collectives;
they ride ICI per the mesh layout).

Leaf rule (shape-based, name-agnostic — works for any flax tree and the
optax mu/nu/EMA mirrors):
  * leaves with fewer than `min_size` elements stay replicated — below
    ~64k elements the all-gather latency costs more than the memory saved
    (biases, GN affines, time-embedding vectors);
  * otherwise shard the LAST dimension divisible by n_data (out-channels
    for conv/linear kernels: the contiguous, lane-friendly choice), else
    replicate.

Composition with tensor parallelism (parallel/tp.py): tp's rules claim
their dim over 'model' first; fsdp then shards a DIFFERENT dim of the
same leaf over 'data' when one divides (Megatron+ZeRO layering). Mixed
specs like P(None, None, 'data', 'model') are valid GSPMD.

Usage (Trainer(fsdp=True) wires this):
    mesh = make_mesh(n_data=8)
    sh = fsdp_state_shardings(state, mesh)
    step = jax.jit(step_fn, in_shardings=(sh, data, rep),
                   out_shardings=(sh, rep), donate_argnums=(0,))
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# below this many elements a leaf is replicated (gather latency > memory)
DEFAULT_MIN_SIZE = 65_536


def fsdp_spec(
    shape,
    n_data: int,
    min_size: int = DEFAULT_MIN_SIZE,
    base: Optional[P] = None,
) -> P:
    """PartitionSpec sharding one dim of `shape` over 'data'.

    `base` is an existing spec (e.g. from tp.py) whose claimed dims are
    kept; fsdp picks among the still-unclaimed dims only.
    """
    size = 1
    for d in shape:
        size *= int(d)
    entries = list(base) if base is not None else []
    entries += [None] * (len(shape) - len(entries))
    if n_data <= 1 or size < min_size or not shape:
        return P(*entries) if any(e is not None for e in entries) else P()
    free = [i for i, e in enumerate(entries) if e is None]
    import os

    order = reversed(free)
    if os.environ.get("ADM_TPU_FSDP_DIM") == "cin" and len(shape) == 4:
        # A/B probe (tools/tp_leak_probe.py): shard Cin first for conv
        # kernels — the bwd dgrad contracts Cout, so a Cin shard may avoid
        # the reverse-op resharding XLA warns about
        order = [i for i in (2, 3, 1, 0) if i in free]
    # last divisible free dim (out-channels for conv/linear kernels)
    pick = None
    for i in order:
        if shape[i] % n_data == 0:
            pick = i
            break
    if pick is None:
        return P(*entries) if any(e is not None for e in entries) else P()
    entries[pick] = "data"
    return P(*entries)


def fsdp_param_shardings(
    params: Any, mesh: Mesh, min_size: int = DEFAULT_MIN_SIZE
) -> Any:
    """NamedSharding pytree mirroring `params` (also valid for optax
    moment trees and the EMA copy — same tree structure)."""
    n_data = mesh.shape.get("data", 1)

    def one(leaf):
        return NamedSharding(
            mesh, fsdp_spec(getattr(leaf, "shape", ()), n_data, min_size)
        )

    return jax.tree_util.tree_map(one, params)


def fsdp_state_shardings(
    state: Any,
    mesh: Mesh,
    min_size: int = DEFAULT_MIN_SIZE,
    with_tp: bool = False,
) -> Any:
    """TrainState-shaped sharding tree. with_tp=True layers fsdp under the
    Megatron tp rules: tp claims its dim over 'model', fsdp shards another
    dim of the same leaf over 'data' where one divides."""
    n_data = mesh.shape.get("data", 1)
    if not with_tp:
        return fsdp_param_shardings(state, mesh, min_size)

    from adm_tpu.parallel.tp import _spec_for

    tp = mesh.shape.get("model", 1)

    def one(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        shape = getattr(leaf, "shape", ())
        base = _spec_for(names, shape, tp)
        return NamedSharding(mesh, fsdp_spec(shape, n_data, min_size, base))

    return jax.tree_util.tree_map_with_path(one, state)
