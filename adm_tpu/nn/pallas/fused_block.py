"""Fused GroupNorm -> SiLU -> Conv3x3 forward as one Pallas pass.

This is the core traffic cut identified by the round-1 perf study
(BASELINE.md): the train/sample step is HBM-bandwidth-bound (8.6 TFLOP vs
68 GB accessed), and the UNet's repeated GN->SiLU->conv chains are the
bulk of the re-reads. This kernel keeps one sample's activation resident
in VMEM: read x once, normalize+activate in registers, run the 3x3 conv as
9 shifted (HW, Cin) x (Cin, Cout) MXU matmuls, write the conv output once.

Inference-path kernel (no custom VJP yet — the backward fusion is the
round-2 work); wired behind `use_fused_block` for the sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adm_tpu.nn.pallas.groupnorm import _group_matrix

Array = jax.Array


def _kernel(x_ref, scale_ref, bias_ref, w_ref, cb_ref, o_ref, *,
            groups: int, eps: float, sb: int):
    """sb samples per program: bigger matmuls per DMA round-trip."""
    i = pl.program_id(0)
    _, h, w, c = x_ref.shape
    c_out = o_ref.shape[-1]
    hw = h * w
    x = x_ref[:].reshape(sb, hw, c)

    # per-sample group statistics, all lane-aligned; fp32 reductions over
    # the bf16 block WITHOUT materializing an fp32 copy (VMEM budget)
    m = _group_matrix(c, groups)  # (C, G)
    n = hw * (c // groups)
    ch_sum = jnp.sum(x, axis=1, dtype=jnp.float32)  # (sb, C)
    ch_sq = jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=1,
        dtype=jnp.float32,
    )
    g_mean = jnp.dot(ch_sum, m, preferred_element_type=jnp.float32) / n
    g_sq = jnp.dot(ch_sq, m, preferred_element_type=jnp.float32) / n
    mean_c = jnp.dot(g_mean, m.T, preferred_element_type=jnp.float32)  # (sb, C)
    var_c = jnp.dot(g_sq, m.T, preferred_element_type=jnp.float32) - mean_c**2
    rstd_c = jax.lax.rsqrt(var_c + eps)

    scale = scale_ref[0].astype(jnp.float32)  # (sb, C)
    bias = bias_ref[0].astype(jnp.float32)
    # fold GN affine into one multiply-add: z = x*a + b. The sigmoid runs on
    # a 2D fp32 view — Mosaic miscompiles bf16 3D logistic (verified bug:
    # f32 scalar broadcast into a bf16 vector).
    a = (rstd_c * scale)[:, None, :].astype(x.dtype)
    bb = (bias - mean_c * rstd_c * scale)[:, None, :].astype(x.dtype)
    z32 = (x * a + bb).reshape(sb * hw, c).astype(jnp.float32)
    act = (z32 * jax.nn.sigmoid(z32)).astype(x.dtype).reshape(sb, h, w, c)
    # zero-pad each sample spatially via typed concatenates (Mosaic lacks
    # dynamic_update_slice, and jnp.pad's f32 constant trips a bf16
    # broadcast verification bug)
    zrow = jnp.zeros((sb, 1, w, c), act.dtype)
    pad = jnp.concatenate([zrow, act, zrow], axis=1)
    zcol = jnp.zeros((sb, h + 2, 1, c), act.dtype)
    pad = jnp.concatenate([zcol, pad, zcol], axis=2)

    acc = jnp.zeros((sb * hw, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.slice(
                pad, (0, dy, dx, 0), (sb, dy + h, dx + w, c)
            )
            acc = acc + jnp.dot(
                patch.reshape(sb * hw, c),
                # match the activation dtype — a hardcoded bf16 cast would
                # silently degrade fp32 models that opt into the fusion
                w_ref[dy, dx].astype(act.dtype),
                preferred_element_type=jnp.float32,
            )
    acc = acc + cb_ref[:].reshape(1, c_out).astype(jnp.float32)
    o_ref[:] = acc.reshape(sb, h, w, c_out).astype(o_ref.dtype)


def fused_gn_silu_conv3x3(
    x: Array,
    gn_scale: Array,
    gn_bias: Array,
    conv_kernel: Array,  # (3, 3, Cin, Cout)
    conv_bias: Array,  # (Cout,)
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
    samples_per_block: int = 4,
) -> Array:
    """conv3x3(silu(groupnorm(x)*scale+bias)) in one pass. NHWC, SAME pad.

    gn_scale/gn_bias: (C,) or per-sample (B, C) — the adaptive scale/shift
    path folds in exactly as in fused_groupnorm_silu. samples_per_block
    batches several samples into each program for bigger MXU matmuls
    (VMEM budget: sb * (in + out + padded act + fp32 views); 2 fits the
    16 MB scoped limit inside a full UNet graph).
    """
    b, h, w, c = x.shape
    c_out = conv_kernel.shape[-1]
    if gn_scale.ndim == 1:
        gn_scale = jnp.broadcast_to(gn_scale[None, :], (b, c))
    if gn_bias.ndim == 1:
        gn_bias = jnp.broadcast_to(gn_bias[None, :], (b, c))
    # auto-scale samples-per-block to the ~16MB scoped VMEM budget: per
    # sample the kernel holds pipelined in/out blocks, the padded bf16
    # activation, one fp32 view and the fp32 accumulator (coarse estimate)
    est = h * w * (10 * c + 8 * c_out)
    budget = 11 * 1024 * 1024
    sb = samples_per_block
    while sb > 1 and sb * est > budget:
        sb //= 2
    while b % sb:
        sb //= 2
    # per-program affine rows as (B//sb, sb, C) blocks (Mosaic rejects
    # dynamic row loads from a full VMEM array)
    gn_scale = gn_scale.reshape(b // sb, sb, c)
    gn_bias = gn_bias.reshape(b // sb, sb, c)
    kernel = functools.partial(_kernel, groups=groups, eps=eps, sb=sb)
    return pl.pallas_call(
        kernel,
        grid=(b // sb,),
        in_specs=[
            pl.BlockSpec((sb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sb, h, w, c_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        interpret=interpret,
    )(x, gn_scale, gn_bias, conv_kernel, conv_bias)


def gn_silu_conv3x3_reference(x, gn_scale, gn_bias, conv_kernel, conv_bias,
                              groups=32, eps=1e-5):
    from adm_tpu.nn.pallas.groupnorm import groupnorm_silu_reference

    act = groupnorm_silu_reference(x, gn_scale, gn_bias, groups, eps)
    y = jax.lax.conv_general_dilated(
        act.astype(x.dtype),
        conv_kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + conv_bias).astype(x.dtype)
