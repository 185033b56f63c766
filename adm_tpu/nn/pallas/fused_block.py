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

from adm_tpu.nn.pallas.groupnorm import _group_stats

Array = jax.Array


from adm_tpu.nn.pallas.groupnorm import _group_matrix


def _kernel(x_ref, scale_ref, bias_ref, w_ref, cb_ref, o_ref, *,
            groups: int, eps: float, sb: int):
    """sb samples per program: bigger matmuls per DMA round-trip."""
    i = pl.program_id(0)
    _, h, w, c = x_ref.shape
    c_out = o_ref.shape[-1]
    hw = h * w
    x32 = x_ref[:].reshape(sb, hw, c).astype(jnp.float32)

    # per-sample group statistics, all lane-aligned:
    m = _group_matrix(c, groups)  # (C, G)
    n = hw * (c // groups)
    ch_sum = jnp.sum(x32, axis=1)  # (sb, C)
    ch_sq = jnp.sum(x32 * x32, axis=1)
    g_mean = jnp.dot(ch_sum, m, preferred_element_type=jnp.float32) / n
    g_sq = jnp.dot(ch_sq, m, preferred_element_type=jnp.float32) / n
    mean_c = jnp.dot(g_mean, m.T, preferred_element_type=jnp.float32)  # (sb, C)
    var_c = jnp.dot(g_sq, m.T, preferred_element_type=jnp.float32) - mean_c**2
    rstd_c = jax.lax.rsqrt(var_c + eps)

    scale = scale_ref[pl.ds(i * sb, sb)].astype(jnp.float32)  # (sb, C)
    bias = bias_ref[pl.ds(i * sb, sb)].astype(jnp.float32)
    z = (x32 - mean_c[:, None, :]) * rstd_c[:, None, :]
    z = z * scale[:, None, :] + bias[:, None, :]
    act = (z * jax.nn.sigmoid(z)).astype(jnp.bfloat16).reshape(sb, h, w, c)
    # zero-pad each sample spatially (static pad; Mosaic lacks
    # dynamic_update_slice)
    pad = jnp.pad(act, ((0, 0), (1, 1), (1, 1), (0, 0)))

    acc = jnp.zeros((sb * hw, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.slice(
                pad, (0, dy, dx, 0), (sb, dy + h, dx + w, c)
            )
            acc = acc + jnp.dot(
                patch.reshape(sb * hw, c),
                w_ref[dy, dx].astype(jnp.bfloat16),
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
    samples_per_block: int = 8,
) -> Array:
    """conv3x3(silu(groupnorm(x)*scale+bias)) in one pass. NHWC, SAME pad.

    gn_scale/gn_bias: (C,) or per-sample (B, C) — the adaptive scale/shift
    path folds in exactly as in fused_groupnorm_silu. samples_per_block
    batches several samples into each program for bigger MXU matmuls
    (VMEM budget: sb * (in + out + padded act) — 8 fits 32x32x192..384).
    """
    b, h, w, c = x.shape
    c_out = conv_kernel.shape[-1]
    if gn_scale.ndim == 1:
        gn_scale = jnp.broadcast_to(gn_scale[None, :], (b, c))
    if gn_bias.ndim == 1:
        gn_bias = jnp.broadcast_to(gn_bias[None, :], (b, c))
    sb = samples_per_block
    while b % sb:
        sb //= 2
    kernel = functools.partial(_kernel, groups=groups, eps=eps, sb=sb)
    return pl.pallas_call(
        kernel,
        grid=(b // sb,),
        in_specs=[
            pl.BlockSpec((sb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
        act.astype(jnp.bfloat16),
        conv_kernel.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + conv_bias).astype(x.dtype)
