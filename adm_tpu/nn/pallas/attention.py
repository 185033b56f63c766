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

Array = jax.Array


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # (S, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, S)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (S, S)
    # dv = p^T do
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp = do v^T ; softmax vjp: ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _spec():
    return pl.BlockSpec(
        index_map=lambda b, h: (b, h, 0, 0), block_shape=(1, 1, None, None)
    )


def _bh_specs(b, h, s, d):
    blk = (1, 1, s, d)
    return pl.BlockSpec(blk, lambda i, j: (i, j, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def small_seq_attention(q: Array, k: Array, v: Array, scale: float,
                        interpret: bool = False) -> Array:
    """softmax(q k^T * scale) v with fp32 softmax, (B, H, S, D) layout."""
    o, _ = _attn_fwd(q, k, v, scale, interpret)
    return o


def _attn_fwd(q, k, v, scale, interpret):
    b, h, s, d = q.shape
    spec = _bh_specs(b, h, s, d)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v)


def _attn_bwd(scale, interpret, res, do):
    q, k, v = res
    b, h, s, d = q.shape
    spec = _bh_specs(b, h, s, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


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
