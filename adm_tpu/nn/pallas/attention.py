"""VMEM-resident self-attention for short sequences (Pallas, fwd + bwd).

The flagship UNet attends at 16x16 (seq 256) and 8x8 (seq 64) with head_dim
64. XLA's einsum+softmax path materializes the fp32 (seq, seq) logits in HBM
(measured 1.04 ms per site at B=128, h=6, s=256 — 6% MFU, pure bandwidth);
jax's bundled flash-attention wants head_dim 128 and loses at these shapes
(BASELINE.md round-1 finding). Here the whole (seq, seq) block lives in VMEM
per (batch, head) program — logits never touch HBM — and the backward
recomputes the softmax from (q, k) instead of storing it.

Numerics match the reference's fp32-softmax attention
(unet/uncond_unet.py:136-149): logits and softmax in fp32, output cast back.

Shapes: q, k, v are (B, H, S, D); S*S fp32 + a few S*D blocks must fit VMEM
(S <= 1024 comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

Array = jax.Array


def _batch0(mesh, sharding, ndim):
    """Keep the (batch, head) axes of a sharding; replicate s/d. Heads
    shard under tensor parallelism (parallel/tp.py): attention is
    independent per head, and the kernel flattens local b*h."""
    spec = getattr(sharding, "spec", None)
    lead = spec[0] if spec is not None and len(spec) else None
    head = spec[1] if spec is not None and len(spec) > 1 else None
    return NamedSharding(mesh, P(lead, head, *([None] * (ndim - 2))))


def _make_partitioned(n_in, n_out, local_fn):
    """Wrap `local_fn` (pure, batch-parallel over dims 0-1 of every operand
    and result) so SPMD shards it over the data (and optionally model/head)
    axes instead of replicating the custom call — pallas_call alone gets no
    SPMD rule and would force all-gathers on a multi-chip mesh. s/d must be
    fully local to the kernel."""

    @custom_partitioning
    def call(*args):
        return local_fn(*args)

    def infer(mesh, arg_shapes, result_shape):
        shardings = tuple(
            _batch0(mesh, arg_shapes[0].sharding, r.ndim)
            for r in (
                result_shape if isinstance(result_shape, tuple) else (result_shape,)
            )
        )
        return shardings if n_out > 1 else shardings[0]

    def partition(mesh, arg_shapes, result_shape):
        results = (
            result_shape if isinstance(result_shape, tuple) else (result_shape,)
        )
        arg_sh = tuple(
            _batch0(mesh, a.sharding, a.ndim) for a in arg_shapes
        )
        res_sh = tuple(_batch0(mesh, arg_shapes[0].sharding, r.ndim) for r in results)
        return (
            mesh,
            local_fn,
            res_sh if n_out > 1 else res_sh[0],
            arg_sh,
        )

    operand = "b h s d"
    rule = (
        ", ".join([operand] * n_in) + " -> " + ", ".join([operand] * n_out)
    )
    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("s", "d"),
    )
    return call


def _softmax_rows(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bdot(a, b, contract_a, contract_b):
    """batched (leading-dim) dot with fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, tile: int):
    # `tile` (batch*head) pairs per program as ONE batched matmul: one tiny
    # attention per pair is grid-overhead-bound, and an unrolled per-pair
    # loop underutilizes the MXU. Matmuls run in the input dtype (bf16 at
    # full MXU rate in the net) with fp32 accumulation; softmax is fp32 —
    # matching the reference's fp32 attention island, whose fp32 inputs are
    # themselves upcast bf16 activations (unet/uncond_unet.py:136-149).
    q = q_ref[:]  # (T, S, D)
    k = k_ref[:]
    v = v_ref[:]
    s = _bdot(q, k, 2, 2) * scale  # (T, S, S) fp32
    p = _softmax_rows(s)
    o = _bdot(p.astype(q.dtype), v, 2, 1)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, tile: int):
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    s = _bdot(q, k, 2, 2) * scale
    p = _softmax_rows(s)  # (T, S, S) fp32
    pd = p.astype(q.dtype)
    # dv = p^T do   (contract the query axis)
    dv = jax.lax.dot_general(
        pd, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dp = do v^T ; softmax vjp: ds = p * (dp - rowsum(dp * p))
    dp = _bdot(do, v, 2, 2)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsd = ds.astype(q.dtype)
    dq = _bdot(dsd, k, 2, 1) * scale
    dk = jax.lax.dot_general(
        dsd, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pick_tile(bh: int, s: int, d: int) -> int:
    """Largest divisor of bh keeping ~<=4MB fp32 working set per program."""
    budget = 4 * 1024 * 1024
    per_pair = 4 * (s * s + 4 * s * d)
    tile = max(1, min(bh, budget // max(per_pair, 1)))
    while bh % tile:
        tile -= 1
    return tile


def _bh_specs(s, d, tile):
    blk = (tile, s, d)
    return pl.BlockSpec(blk, lambda i: (i, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def small_seq_attention(q: Array, k: Array, v: Array, scale: float,
                        interpret: bool = False) -> Array:
    """softmax(q k^T * scale) v with fp32 softmax, (B, H, S, D) layout."""
    o, _ = _attn_fwd(q, k, v, scale, interpret)
    return o


def _fwd_local(scale, interpret, q, k, v):
    """Per-shard fwd on (B, H, S, D) — pure and batch-parallel over dim 0."""
    b, h, s, d = q.shape
    bh = b * h
    tile = _pick_tile(bh, s, d)
    spec = _bh_specs(s, d, tile)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, tile=tile),
        grid=(bh // tile,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        interpret=interpret,
    )(q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d))
    return o.reshape(q.shape)


def _bwd_local(scale, interpret, q, k, v, do):
    b, h, s, d = q.shape
    bh = b * h
    # the bwd working set is ~3x the fwd's; shrink the tile
    tile = _pick_tile(bh, s, 3 * d)
    spec = _bh_specs(s, d, tile)
    flat = jax.ShapeDtypeStruct((bh, s, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, tile=tile),
        grid=(bh // tile,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(flat, flat, flat),
        interpret=interpret,
    )(
        q.reshape(bh, s, d),
        k.reshape(bh, s, d),
        v.reshape(bh, s, d),
        do.reshape(bh, s, d),
    )
    return dq.reshape(q.shape), dk.reshape(q.shape), dv.reshape(q.shape)


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale: float, interpret: bool):
    return _make_partitioned(3, 1, functools.partial(_fwd_local, scale, interpret))


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(scale: float, interpret: bool):
    return _make_partitioned(4, 3, functools.partial(_bwd_local, scale, interpret))


def _attn_fwd(q, k, v, scale, interpret):
    o = _partitioned_fwd(float(scale), bool(interpret))(q, k, v)
    return o, (q, k, v)


def _attn_bwd(scale, interpret, res, do):
    q, k, v = res
    return _partitioned_bwd(float(scale), bool(interpret))(q, k, v, do)


small_seq_attention.defvjp(_attn_fwd, _attn_bwd)


def attention_reference(q, k, v, scale):
    """fp32 einsum+softmax reference (the XLA path being replaced)."""
    q32 = q.astype(jnp.float32) * scale
    k32 = k.astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q32, k32)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)).astype(
        q.dtype
    )
