"""Stride-1 SAME conv3x3 as K-packed MXU matmuls (Pallas, fwd + bwd).

Why XLA loses at the flagship's conv shapes (PERF_r2.jsonl, fenced):
the conv emitter formulates each output tile as (HW, Cin) x (Cin, Cout)
matmuls, so BOTH the contraction (K=Cin) and output-lane (N=Cout) dims pad
to 128-lane multiples. At C=192 that is a hard 0.75^2 ceiling on each tap's
matmul — measured 59% MFU at 128x32x32x192->192 vs 79% for the lane-aligned
192->256 control (identical 0.74-0.75 ms: the padding IS the difference).

This kernel packs the nine taps' contractions instead: patches for four
taps concatenate along channels into K=4*Cin (768 at C=192, 1536 at C=384 —
both exact multiples of 128), so the conv becomes 3 dots (4+4+1 taps) with
K-efficiency 13.5/14 = 96.4% regardless of Cin alignment. N=Cout padding
remains (inherent to the layout), but the compound ceiling rises from 56%
to 72% at C=192 and to ~96% at C=384.

MEASURED VERDICT (PERF_r2.jsonl conv_pallas, scan-amortized, fenced,
v5e-1): the patch build is a serialized VPU copy of 9x the input (~0.27 ms
at these sizes) that caps the kernel at ~65% of its matmul ceiling —
PARITY with XLA at 128x16x16x384 (0.70-0.73 ms both ways, run variance
±4%), -25% at 128x32x32x192, -20% at 8x8. fwd+bwd (this kernel's dx + XLA
dw): 1.68 vs 1.63 ms at 16x16x384 — XLA's autodiff convs run at 73-81%
MFU, no backward-side opportunity. Moving the patch build onto the DMA
engine (double-buffered VMEM->VMEM taps) measured SLOWER still (0.918 ms
at 16x16x384): nine ~0.4MB copies don't overlap enough to pay for their
issue cost. XLA's conv emitter therefore stays the default training path;
this op is kept as the measured, tested scaffold, exposed for experiments
via use_pallas_conv.

Kernel structure per grid program (sb samples, auto-sized to VMEM):
  read x block once -> zero-pad spatially via typed concats (Mosaic lacks
  dynamic_update_slice; fused_block.py finding) -> for each tap group,
  concat the shifted slices along channels and run ONE (sb*HW, gC) x
  (gC, Cout) dot with fp32 accumulation -> write the output block once.

Backward: dx is the same kernel with spatially-flipped, io-transposed
weights (conv-transpose identity for stride-1 SAME); dw/db fall back to
XLA's correlation, whose contraction over B*HW is huge and lane-aligned —
exactly the shape XLA is already good at.

Reference conv call sites being replaced: unet/uncond_unet.py:98-113
(Conv2d inside UNetBlock, :157-211). TPU-native design, not a port.
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

# taps in (dy, dx) raster order; groups of 4 keep K=4C lane-aligned for the
# model's channel widths (C % 32 == 0 -> 4C % 128 == 0)
_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]
_GROUPS = (_TAPS[0:4], _TAPS[4:8], _TAPS[8:9])


def _kernel(x_ref, w_ref, o_ref, *, sb: int):
    _, h, w, c = x_ref.shape
    c_out = o_ref.shape[-1]
    hw = h * w
    x = x_ref[:]

    # zero-pad each sample spatially via typed concatenates (Mosaic lacks
    # dynamic_update_slice; see fused_block.py)
    zrow = jnp.zeros((sb, 1, w, c), x.dtype)
    pad = jnp.concatenate([zrow, x, zrow], axis=1)
    zcol = jnp.zeros((sb, h + 2, 1, c), x.dtype)
    pad = jnp.concatenate([zcol, pad, zcol], axis=2)

    acc = jnp.zeros((sb * hw, c_out), jnp.float32)
    row = 0
    for group in _GROUPS:
        # each shifted slice reshapes to 2D BEFORE the lane-axis concat:
        # Mosaic's compiler crashes on a 4D shifted-slice + 4D lane concat,
        # but the same data as (rows, C) blocks concatenates fine (measured
        # Mosaic finding, round 2)
        patches = [
            jax.lax.slice(
                pad, (0, dy, dx, 0), (sb, dy + h, dx + w, c)
            ).reshape(sb * hw, c)
            for (dy, dx) in group
        ]
        lhs = (
            patches[0]
            if len(patches) == 1
            else jnp.concatenate(patches, axis=-1)
        )
        rhs = w_ref[row : row + len(group) * c, :].astype(x.dtype)
        acc = acc + jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        row += len(group) * c
    o_ref[:] = acc.reshape(sb, h, w, c_out).astype(o_ref.dtype)


def _pick_sb(b: int, h: int, w: int, c: int, c_out: int) -> int:
    """Samples per program under the ~16MB VMEM budget (coarse estimate:
    pipelined in/out pairs + padded block + largest group patch + fp32 acc)."""
    est = h * w * 2 * (2 * c + 2 * c_out + c + 4 * c + 2 * c_out) + 2 * (
        (h + 2) * (w + 2) * c
    )
    budget = 11 * 1024 * 1024
    sb = max(1, budget // max(est, 1))
    while b % sb:
        sb -= 1
    return sb


def _conv_local(interpret: bool, x: Array, w2: Array) -> Array:
    """Per-shard conv: x (B, H, W, C), w2 (9*C, Cout) in tap-raster order."""
    b, h, wd, c = x.shape
    c_out = w2.shape[-1]
    sb = _pick_sb(b, h, wd, c, c_out)
    return pl.pallas_call(
        functools.partial(_kernel, sb=sb),
        grid=(b // sb,),
        in_specs=[
            pl.BlockSpec((sb, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb, h, wd, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c_out), x.dtype),
        interpret=interpret,
    )(x, w2)


@functools.lru_cache(maxsize=None)
def _partitioned_conv(interpret: bool):
    """Batch-dim SPMD rule (pallas_call alone has none — a multi-chip mesh
    would all-gather around the kernel). Only x's dim 0 shards; weights
    replicate; h/w/c stay local to the kernel."""
    local_fn = functools.partial(_conv_local, interpret)

    @custom_partitioning
    def call(x, w2):
        return local_fn(x, w2)

    def _b0(mesh, sharding, ndim):
        spec = getattr(sharding, "spec", None)
        lead = spec[0] if spec is not None and len(spec) else None
        return NamedSharding(mesh, P(lead, *([None] * (ndim - 1))))

    def infer(mesh, arg_shapes, result_shape):
        return _b0(mesh, arg_shapes[0].sharding, result_shape.ndim)

    def partition(mesh, arg_shapes, result_shape):
        xsh = _b0(mesh, arg_shapes[0].sharding, 4)
        wsh = NamedSharding(mesh, P(None, None))
        return mesh, local_fn, xsh, (xsh, wsh)

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b p q i, k o -> b p q o",
        need_replication_factors=("p", "q", "i", "k", "o"),
    )
    return call


def _pack_weights(w: Array) -> Array:
    """(3, 3, Cin, Cout) -> (9*Cin, Cout) in tap-raster order."""
    return w.reshape(9 * w.shape[2], w.shape[3])


def _xla_conv(x: Array, w: Array) -> Array:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same(x: Array, w: Array, interpret: bool = False) -> Array:
    """Stride-1 SAME 3x3 conv, NHWC x HWIO -> NHWC. Differentiable.

    Matches jax.lax.conv_general_dilated numerics (fp32 accumulation; the
    dots run in x.dtype). interpret=True runs the Pallas interpreter (CPU
    correctness tests).
    """
    y, _ = _conv_fwd(x, w, interpret)
    return y


def _apply(x, w, interpret):
    return _partitioned_conv(bool(interpret))(
        x, _pack_weights(w.astype(x.dtype))
    )


def _conv_fwd(x, w, interpret):
    return _apply(x, w, interpret), (x, w)


def _conv_bwd(interpret, res, dy):
    x, w = res
    # dx: conv-transpose == SAME conv3x3 with spatially-flipped, io-swapped
    # weights (stride 1) -> reuse the Pallas kernel
    w_flip = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _apply(dy, w_flip.astype(dy.dtype), interpret)
    # dw: correlation contracting over B*H*W — lane-aligned and huge, XLA's
    # sweet spot; jax.vjp of the XLA conv also keeps SPMD psum insertion
    # automatic on a sharded mesh
    _, pull = jax.vjp(lambda wv: _xla_conv(x, wv), w.astype(x.dtype))
    (dw,) = pull(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3_same.defvjp(_conv_fwd, _conv_bwd)
