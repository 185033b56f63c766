"""Dropout via the TPU's hardware PRNG (Pallas), with a recompute-from-seed VJP.

Round-1 perf study (BASELINE.md): generating dropout masks with JAX's
threefry PRNG costs ~13% of the flagship train step, and the rbg
alternative intermittently crashes the axon compile service. The TPU core
has a native PRNG instruction (`pltpu.prng_random_bits`) that makes mask
generation essentially free.

Two structural wins over `nn.Dropout`:
  * mask generation is a native instruction instead of ~10 VPU ops/element
    of threefry hashing;
  * the backward pass RE-GENERATES the mask from the same scalar seed
    instead of storing it — zero HBM traffic and zero residual memory for
    masks (the standard path stores one mask per dropout site for the
    backward pass).

Semantics match `flax.linen.Dropout` (inverted dropout): keep with
probability (1-rate), scale kept values by 1/(1-rate). The mask depends
only on (seed, shape, rate, shard layout) — NOT on x — so fwd and bwd agree
exactly whenever the cotangent is sharded like the forward activation.
Caveat (ADVICE r2): under the pass-through SPMD rule each shard draws its
own PRNG stream, so if GSPMD ever assigned dy a DIFFERENT layout than x the
regenerated bwd mask would diverge. In the shipped TP/FSDP configs the
cotangent of an elementwise op inherits the primal's sharding (same
surrounding operators), and the single-chip path has no layout at all; if
a future config reshards inside the UNetBlock, prefer nn.Dropout there.

Reference dropout site: unet/uncond_unet.py:189-196 (torch nn.Dropout in
UNetBlock); this is a TPU-native replacement, not a port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# rows per grid program; lanes = channel dim (kept whole, padded by Mosaic)
_ROW_BLOCK = 1024

# layout sentry (ADVICE r3): the bwd pass REGENERATES the mask per shard, so
# fwd and bwd must see the same GSPMD layout. The partition callback records
# the spec seen per (global shape, rate); a second, DIFFERENT spec for the
# same site signature means GSPMD resharded the cotangent and the regenerated
# bwd mask would silently diverge — warn loudly (raise under
# ADM_TPU_STRICT_DROPOUT=1) so the config is moved to nn.Dropout instead.
_seen_layouts: dict = {}


def _layout_sentry(mesh, shape, rate, spec) -> None:
    """Cross-checks the layouts seen per (mesh, shape, rate) site signature.

    The mesh is part of the key (code-review r4): a second PROGRAM
    legitimately compiled over a different mesh (dp step then dp x tp
    step) must not trip the fwd/bwd-divergence alarm — within one
    program the mesh is fixed, so fwd and bwd still share a key.
    Residual limitation: two different programs on the SAME mesh whose
    dropout inputs are sharded differently still collide (the callback
    has no program identity); call reset_layout_sentry() between such
    compiles, or disable hw_dropout for one of them.
    """
    import logging
    import os

    key = (mesh, tuple(shape), rate)
    spec = tuple(spec) if spec is not None else None
    prev = _seen_layouts.setdefault(key, spec)
    if prev != spec:
        msg = (
            f"hw_dropout layout mismatch for shape {shape}: partition specs "
            f"{prev} vs {spec} seen for the same site signature — if these "
            "are the fwd/bwd of one dropout site, the regenerated backward "
            "mask DIVERGES from the forward mask. Use nn.Dropout "
            "(use_hw_dropout=False) for this config, or "
            "reset_layout_sentry() if these are two separate programs "
            "sharing a mesh."
        )
        if os.environ.get("ADM_TPU_STRICT_DROPOUT"):
            raise RuntimeError(msg)
        logging.getLogger("adm_tpu").warning(msg)


def reset_layout_sentry() -> None:
    """Forget recorded layouts (between deliberately different programs)."""
    _seen_layouts.clear()


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float):
    # distinct stream per program: fold the grid index into the seed
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(x_ref.shape)  # uint32
    # keep iff bits >= threshold  (threshold = rate * 2^32)
    keep = (bits >= jnp.uint32(threshold)).astype(x_ref.dtype)
    o_ref[:] = x_ref[:] * keep * jnp.asarray(inv_keep, x_ref.dtype)


def _mask_kernel(seed_ref, o_ref, *, threshold: int):
    """Mask-only variant (for the VJP: grad = dy * mask * inv_keep)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(o_ref.shape)
    o_ref[:] = (bits >= jnp.uint32(threshold)).astype(o_ref.dtype)


def _as_2d(x: Array):
    c = x.shape[-1]
    rows = x.size // c
    return x.reshape(rows, c), rows, c


def _row_block(rows: int) -> int:
    rb = min(_ROW_BLOCK, rows)
    while rows % rb:
        rb //= 2
    return max(rb, 1)


def _seed_scalar(key: Array) -> Array:
    """Fold a JAX PRNG key into one int32 seed for the HW PRNG."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = data[0]
    for i in range(1, data.shape[0]):
        seed = seed ^ (data[i] + jnp.uint32(0x9E3779B9) + (seed << 6) + (seed >> 2))
    return seed.astype(jnp.int32).reshape(1)


def _run(kernel, seed, shape, dtype, rows, c, rb, interpret, extra=None):
    grid = (rows // rb,)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [seed]
    if extra is not None:
        in_specs.append(
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(extra)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), dtype),
        interpret=interpret,
    )(*args)


def _kernel_apply(rate: float, v: Array, seed: Array) -> Array:
    """Local-shard pallas dropout on any-rank v (channels last)."""
    v2, rows, c = _as_2d(v)
    rb = _row_block(rows)
    threshold = min(int(round(rate * 2**32)), 2**32 - 1)
    kern = functools.partial(
        _dropout_kernel, threshold=threshold, inv_keep=1.0 / (1.0 - rate)
    )
    y = _run(kern, seed, v.shape, v.dtype, rows, c, rb, False, extra=v2)
    return y.reshape(v.shape)


@functools.lru_cache(maxsize=None)
def _partitioned_apply(rate: float, ndim: int):
    """Pass-through SPMD rule: pallas_call has none, so a multi-chip mesh
    would replicate (all-gather) around the kernel. The op is elementwise,
    so ANY input sharding (batch on 'data', channels on 'model' under
    tensor parallelism) is preserved — each shard draws its own PRNG
    stream, so the mask PATTERN depends on the layout; statistically
    benign, exactly like the per-program streams on one chip."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def call(v, seed):
        return _kernel_apply(rate, v, seed)

    def _vsh(mesh, sharding):
        spec = getattr(sharding, "spec", None)
        if spec is None:
            return NamedSharding(mesh, P(*([None] * ndim)))
        pad = [None] * (ndim - len(spec))
        return NamedSharding(mesh, P(*(list(spec) + pad)))

    def infer(mesh, arg_shapes, result_shape):
        return _vsh(mesh, arg_shapes[0].sharding)

    def partition(mesh, arg_shapes, result_shape):
        sh = _vsh(mesh, arg_shapes[0].sharding)
        _layout_sentry(mesh, arg_shapes[0].shape, rate, sh.spec)
        seed_sh = NamedSharding(mesh, P(None))
        return mesh, functools.partial(_kernel_apply, rate), sh, (sh, seed_sh)

    dims = " ".join(f"d{i}" for i in range(ndim))
    call.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"{dims}, s -> {dims}",
        need_replication_factors=("s",),
    )
    return call


def _apply(v: Array, key: Array, rate: float, emulate: bool) -> Array:
    """mask-and-scale v; the mask depends only on (key, shape, rate)."""
    if emulate:
        # pure-JAX path for CPU tests / non-TPU backends: same semantics,
        # different bits (pltpu.prng_* has no interpret-mode lowering)
        keep = jax.random.bernoulli(key, 1.0 - rate, v.shape)
        return v * keep.astype(v.dtype) / jnp.asarray(1.0 - rate, v.dtype)
    seed = _seed_scalar(key)
    return _partitioned_apply(float(rate), v.ndim)(v, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hw_dropout(x: Array, key: Array, rate: float, emulate: bool = False):
    """Inverted dropout with the TPU hardware PRNG; differentiable.

    key: a JAX PRNGKey; only used to derive a scalar seed. emulate=True uses
    a pure-JAX mask (identical semantics; for non-TPU backends).
    """
    y, _ = _fwd(x, key, rate, emulate)
    return y


def _fwd(x, key, rate, emulate):
    if rate <= 0.0:
        return x, (key,)
    return _apply(x, key, rate, emulate), (key,)


def _bwd(rate, emulate, res, dy):
    (key,) = res
    if rate <= 0.0:
        return dy, None
    # regenerate the identical mask from the seed — nothing was stored
    return _apply(dy, key, rate, emulate), None


hw_dropout.defvjp(_fwd, _bwd)
