"""UNet building blocks (flax.linen, NHWC, TPU-first).

Functional equivalents of the reference's torch blocks
(unet/uncond_unet.py:19-244): scaled-init Linear/Conv2d with optional FIR
up/downsampling, GroupNorm (<=32 groups, >=4 ch/group), the unified UNetBlock
(GN -> SiLU -> conv -> emb scale/shift -> GN -> SiLU -> dropout -> conv ->
skip [+ self-attention]), SpatialAtt decoupling gate, and the two timestep
embeddings.

Design notes (TPU):
  * NHWC everywhere — channels-last is XLA's native conv layout on TPU.
  * Params are fp32; activations run in `dtype` (bf16 for training).
    GroupNorm statistics and attention softmax stay fp32 (the reference also
    forces fp32 attention, unet/uncond_unet.py:136-149).
  * FIR resampling is expressed as (transposed) depthwise convs that XLA maps
    onto fused convolutions; the [1,1] filter fast-paths to repeat/avg-pool.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adm_tpu.nn.init import scaled_init

Array = jax.Array


# ---------------------------------------------------------------------------
# FIR resampling primitives
# ---------------------------------------------------------------------------


def _fir_kernel_2d(resample_filter: Sequence[float]) -> jnp.ndarray:
    """Separable FIR taps -> normalized 2D kernel (reference Conv2d ctor)."""
    f = jnp.asarray(resample_filter, jnp.float32)
    k2 = jnp.outer(f, f) / (jnp.sum(f) ** 2)
    return k2


def fir_upsample_2x(x: Array, resample_filter: Sequence[float]) -> Array:
    """2x FIR upsample: transposed depthwise conv with filter*4.

    Matches reference conv_transpose2d(f*4, groups=C, stride=2, pad=f_pad)
    (unet/uncond_unet.py:106). For [1,1] this is exact 2x nearest-neighbor
    duplication, which we fast-path.
    """
    if list(resample_filter) == [1, 1]:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return x
    k2 = _fir_kernel_2d(resample_filter) * 4.0
    k = k2.shape[0]
    f_pad = (k - 1) // 2
    c = x.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    # conv_transpose(stride 2, pad p) == dilated conv with lhs_dilation 2 and
    # per-side padding (k-1-p); FIR kernels are symmetric so no flip needed.
    pad = k - 1 - f_pad
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def fir_downsample_2x(x: Array, resample_filter: Sequence[float]) -> Array:
    """2x FIR downsample: depthwise stride-2 conv (unet/uncond_unet.py:108).

    For [1,1] this is exact 2x2 average pooling, which we fast-path.
    """
    if list(resample_filter) == [1, 1]:
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
    k2 = _fir_kernel_2d(resample_filter)
    k = k2.shape[0]
    f_pad = (k - 1) // 2
    c = x.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(2, 2),
        padding=[(f_pad, f_pad), (f_pad, f_pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


# ---------------------------------------------------------------------------
# Parameterized layers
# ---------------------------------------------------------------------------


class Linear(nn.Module):
    """Dense layer with the reference's scaled init (unet/uncond_unet.py:53-66)."""

    features: int
    use_bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        w = self.param(
            "kernel",
            scaled_init(self.init_mode, self.init_weight, in_features, self.features),
            (in_features, self.features),
        )
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            b = self.param(
                "bias",
                scaled_init(self.init_mode, self.init_bias, in_features, self.features),
                (self.features,),
            )
            y = y + b.astype(self.dtype)
        return y


class Conv2d(nn.Module):
    """Conv with optional fused FIR up/down resampling (unet/uncond_unet.py:72-113).

    kernel=0 means filter-only resample (no weights), used for projection-free
    skip resampling.
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Tuple[float, ...] = (1, 1)
    fused_resample: bool = False
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    # experimental: route plain stride-1 3x3 convs through the K-packed
    # Pallas kernel (nn/pallas/conv3x3.py). Measured to LOSE to XLA at the
    # flagship's shapes except a +4% edge at 16x16x384 (see the kernel's
    # docstring) — off by default; kept for experiments on other models.
    use_pallas_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, params_only: bool = False):
        """params_only=True materializes (kernel, bias) without computing
        (fused-kernel path; x supplies the input channel count)."""
        assert not (self.up and self.down)
        in_ch = x.shape[-1]
        x = x.astype(self.dtype)

        if params_only:
            fan = in_ch * self.kernel * self.kernel
            fan_out = self.features * self.kernel * self.kernel
            w = self.param(
                "kernel",
                scaled_init(self.init_mode, self.init_weight, fan, fan_out),
                (self.kernel, self.kernel, in_ch, self.features),
            )
            b = (
                self.param(
                    "bias",
                    scaled_init(self.init_mode, self.init_bias, fan, fan_out),
                    (self.features,),
                )
                if self.use_bias
                else jnp.zeros((self.features,), jnp.float32)
            )
            return w, b

        w = None
        if self.kernel:
            fan = in_ch * self.kernel * self.kernel
            fan_out = self.features * self.kernel * self.kernel
            w = self.param(
                "kernel",
                scaled_init(self.init_mode, self.init_weight, fan, fan_out),
                (self.kernel, self.kernel, in_ch, self.features),
            ).astype(self.dtype)
        w_pad = self.kernel // 2 if self.kernel else 0
        f_pad = (len(self.resample_filter) - 1) // 2

        def wconv(h, pad):
            if (
                self.use_pallas_conv
                and self.kernel == 3
                and pad == 1
                and jax.default_backend() in ("tpu", "axon")
            ):
                from adm_tpu.nn.pallas.conv3x3 import conv3x3_same

                return conv3x3_same(h, w)
            return jax.lax.conv_general_dilated(
                h,
                w,
                window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.fused_resample and self.up and w is not None:
            # transposed FIR (reduced pad) then wconv with the residual pad
            x = _fir_up_padded(x, self.resample_filter, max(f_pad - w_pad, 0))
            x = wconv(x, max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and w is not None:
            # reference pads only the weight conv; the FIR stride-2 conv is
            # unpadded (unet/uncond_unet.py:101-103)
            x = wconv(x, w_pad + f_pad)
            x = _fir_down_padded(x, self.resample_filter, 0)
        else:
            if self.up:
                x = fir_upsample_2x(x, self.resample_filter)
            if self.down:
                x = fir_downsample_2x(x, self.resample_filter)
            if w is not None:
                x = wconv(x, w_pad)

        if self.kernel and self.use_bias:
            fan = in_ch * self.kernel * self.kernel
            fan_out = self.features * self.kernel * self.kernel
            b = self.param(
                "bias",
                scaled_init(self.init_mode, self.init_bias, fan, fan_out),
                (self.features,),
            )
            x = x + b.astype(self.dtype)
        return x


def _fir_down_padded(x: Array, resample_filter: Sequence[float], pad: int) -> Array:
    """Depthwise stride-2 FIR conv with explicit padding (fused path)."""
    k2 = _fir_kernel_2d(resample_filter)
    c = x.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(2, 2),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _fir_up_padded(x: Array, resample_filter: Sequence[float], pad: int) -> Array:
    """FIR 2x upsample with an explicit conv_transpose pad (fused path)."""
    k2 = _fir_kernel_2d(resample_filter) * 4.0
    k = k2.shape[0]
    c = x.shape[-1]
    kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    eff = k - 1 - pad
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(eff, eff), (eff, eff)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class GroupNorm(nn.Module):
    """GroupNorm with the reference's group heuristic (unet/uncond_unet.py:119-129).

    num_groups = min(32, C // 4); statistics in fp32 regardless of dtype.
    """

    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def n_groups(self, c: int) -> int:
        return min(self.num_groups, max(c // self.min_channels_per_group, 1))

    @nn.compact
    def __call__(self, x: Array, *, params_only: bool = False):
        """params_only=True materializes (scale, bias) without computing —
        parent modules feed them into fused Pallas kernels under the same
        parameter names."""
        c = x.shape[-1]
        groups = self.n_groups(c)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if params_only:
            return scale, bias
        b, h, w_, _ = x.shape
        xg = x.reshape(b, h, w_, groups, c // groups)
        # statistics in fp32, normalization arithmetic in the compute dtype —
        # a full fp32 activation copy would double HBM traffic and residual
        # memory (it OOMed batch-256 on v5e)
        x32 = xg.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps)
        xg = (xg - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return xg.reshape(b, h, w_, c) * scale.astype(x.dtype) + bias.astype(
            x.dtype
        )


class PositionalEmbedding(nn.Module):
    """DDPM sinusoidal embedding, [cos, sin] order (unet/uncond_unet.py:217-230)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        ang = jnp.outer(t.astype(jnp.float32), freqs)
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


class FourierEmbedding(nn.Module):
    """NCSN++ random Fourier embedding (unet/uncond_unet.py:236-244)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, t: Array) -> Array:
        freqs = self.variable(
            "buffers",
            "freqs",
            lambda: jax.random.normal(
                self.make_rng("params"), (self.num_channels // 2,)
            )
            * self.scale,
        ).value
        ang = jnp.outer(t.astype(jnp.float32), 2 * jnp.pi * freqs)
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


class SpatialAtt(nn.Module):
    """1-channel spatial self-attention gate with Softsign
    (unet/uncond_unet.py:19-37), used by the bottleneck decoupling branches.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        att = nn.Conv(1, (1, 1), dtype=self.dtype, name="map")(x)  # b,h,w,1
        q = nn.Conv(1, (1, 1), dtype=self.dtype, name="q_conv")(att)
        k = nn.Conv(1, (1, 1), dtype=self.dtype, name="k_conv")(att)
        q = q.reshape(b, h * w, 1).astype(jnp.float32)
        k = k.reshape(b, h * w, 1).astype(jnp.float32)
        attf = att.reshape(b, h * w, 1).astype(jnp.float32)
        w_qk = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k), axis=-1)
        gate = jnp.einsum("bqk,bkc->bqc", w_qk, attf).reshape(b, h, w, 1)
        return (jax.nn.soft_sign(gate).astype(x.dtype)) * x


class UNetBlock(nn.Module):
    """Unified DDPM++/NCSN++/ADM residual block (unet/uncond_unet.py:157-211)."""

    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    init_attn_weight: Optional[float] = None
    use_flash_attention: bool = False
    # VMEM-resident Pallas attention for short sequences (TPU only; exact
    # fp32-softmax numerics, custom VJP recomputes instead of storing)
    use_pallas_attention: bool = True
    # fuse GN->SiLU->conv3x3 chains into one Pallas pass (inference path;
    # dropout must be inactive for the second chain)
    use_fused_block: bool = False
    # dropout masks from the TPU hardware PRNG (Pallas) — native-instruction
    # generation + regenerate-in-backward (no mask storage/traffic); falls
    # back to a pure-JAX mask off-TPU. Threefry mask generation measured
    # ~13% of the flagship train step (BASELINE.md).
    use_hw_dropout: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array, deterministic: bool = True) -> Array:
        in_ch = x.shape[-1]
        heads = (
            0
            if not self.attention
            else (
                self.num_heads
                if self.num_heads is not None
                else self.out_channels // self.channels_per_head
            )
        )
        init = dict(
            init_mode=self.init_mode,
            init_weight=self.init_weight,
            init_bias=self.init_bias,
        )
        init_zero = dict(init_mode=self.init_mode, init_weight=0.0, init_bias=0.0)
        init_attn = (
            dict(
                init_mode=self.init_mode,
                init_weight=self.init_attn_weight,
                init_bias=self.init_bias,
            )
            if self.init_attn_weight is not None
            else init
        )

        orig = x
        norm0 = GroupNorm(eps=self.eps, dtype=self.dtype, name="norm0")
        conv0 = Conv2d(
            self.out_channels,
            kernel=3,
            up=self.up,
            down=self.down,
            resample_filter=self.resample_filter,
            dtype=self.dtype,
            name="conv0",
            **init,
        )
        fuse0 = self.use_fused_block and not self.up and not self.down
        if fuse0:
            from adm_tpu.nn.pallas.fused_block import fused_gn_silu_conv3x3

            g_scale, g_bias = norm0(x, params_only=True)
            wk, wb = conv0(x, params_only=True)
            x = fused_gn_silu_conv3x3(
                x, g_scale, g_bias, wk, wb,
                groups=norm0.n_groups(in_ch), eps=self.eps,
            )
        else:
            x = conv0(jax.nn.silu(norm0(x)))

        params = Linear(
            self.out_channels * (2 if self.adaptive_scale else 1),
            dtype=self.dtype,
            name="affine",
            **init,
        )(emb)
        x_norm = GroupNorm(eps=self.eps, dtype=self.dtype, name="norm1")
        conv1 = Conv2d(
            self.out_channels, kernel=3, dtype=self.dtype, name="conv1", **init_zero
        )
        fuse1 = (
            self.use_fused_block
            and self.adaptive_scale
            and (deterministic or self.dropout == 0.0)
        )
        if fuse1:
            from adm_tpu.nn.pallas.fused_block import fused_gn_silu_conv3x3

            g_scale, g_bias = x_norm(x, params_only=True)
            wk, wb = conv1(x, params_only=True)
            scale, shift = jnp.split(params, 2, axis=-1)  # (B, C)
            eff_scale = g_scale[None, :] * (scale.astype(jnp.float32) + 1)
            eff_bias = g_bias[None, :] * (
                scale.astype(jnp.float32) + 1
            ) + shift.astype(jnp.float32)
            x = fused_gn_silu_conv3x3(
                x, eff_scale, eff_bias, wk, wb,
                groups=x_norm.n_groups(x.shape[-1]), eps=self.eps,
            )
        else:
            params_b = params[:, None, None, :]
            if self.adaptive_scale:
                scale, shift = jnp.split(params_b, 2, axis=-1)
                x = jax.nn.silu(shift + x_norm(x) * (scale + 1))
            else:
                x = jax.nn.silu(x_norm(x + params_b))
            if self.dropout > 0.0 and not deterministic:
                if self.use_hw_dropout:
                    from adm_tpu.nn.pallas.dropout import hw_dropout

                    x = hw_dropout(
                        x,
                        self.make_rng("dropout"),
                        self.dropout,
                        jax.default_backend() not in ("tpu", "axon"),
                    )
                else:
                    x = nn.Dropout(self.dropout, deterministic=False)(x)
            x = conv1(x)

        if self.out_channels != in_ch or self.up or self.down:
            kernel = 1 if self.resample_proj or self.out_channels != in_ch else 0
            skip = Conv2d(
                self.out_channels,
                kernel=kernel,
                up=self.up,
                down=self.down,
                resample_filter=self.resample_filter,
                dtype=self.dtype,
                name="skip",
                **init,
            )(orig)
        else:
            skip = orig
        x = (x + skip) * self.skip_scale

        if heads:
            b, h, w, c = x.shape
            y = GroupNorm(eps=self.eps, dtype=self.dtype, name="norm2")(x)
            qkv = Conv2d(c * 3, kernel=1, dtype=self.dtype, name="qkv", **init_attn)(y)
            # (b, h*w, heads, 3, ch_per_head)
            qkv = qkv.reshape(b, h * w, heads, 3, c // heads)
            q, k, v = (
                qkv[..., 0, :],
                qkv[..., 1, :],
                qkv[..., 2, :],
            )  # (b, hw, heads, d)
            d_head = c // heads
            seq = h * w
            use_pallas = (
                self.use_pallas_attention
                and seq <= 1024
                and jax.default_backend() in ("tpu", "axon")
            )
            if use_pallas:
                # VMEM-resident fused attention: the fp32 (seq, seq) softmax
                # never touches HBM (measured 6% MFU / ~1 ms per site on the
                # XLA einsum path at seq 256 — pure logits traffic)
                from adm_tpu.nn.pallas.attention import small_seq_attention

                qh = q.transpose(0, 2, 1, 3)  # (b, heads, seq, d)
                kh = k.transpose(0, 2, 1, 3)
                vh = v.transpose(0, 2, 1, 3)
                a = small_seq_attention(
                    qh, kh, vh, 1.0 / math.sqrt(d_head)
                ).transpose(0, 2, 1, 3)
            elif self.use_flash_attention and seq >= 128:
                # Pallas flash attention: never materializes the (seq,seq)
                # logits in HBM — the fp32 softmax runs blockwise in VMEM.
                # head_dim < 128 is zero-padded to the lane width; the extra
                # MXU flops are tiny next to the logits HBM traffic saved.
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    flash_attention,
                )

                qh = q.transpose(0, 2, 1, 3)  # (b, heads, seq, d)
                kh = k.transpose(0, 2, 1, 3)
                vh = v.transpose(0, 2, 1, 3)
                if d_head < 128:
                    pad = 128 - d_head
                    qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, 0), (0, pad)))
                a = flash_attention(
                    qh, kh, vh, sm_scale=1.0 / math.sqrt(d_head)
                )
                a = a[..., :d_head].transpose(0, 2, 1, 3).astype(x.dtype)
            else:
                # fp32 softmax island (reference forces fp32,
                # uncond_unet.py:136-149)
                q32 = q.astype(jnp.float32)
                k32 = k.astype(jnp.float32) / jnp.sqrt(jnp.float32(d_head))
                logits = jnp.einsum("bqhd,bkhd->bhqk", q32, k32)
                w_att = jax.nn.softmax(logits, axis=-1)
                a = jnp.einsum(
                    "bhqk,bkhd->bqhd", w_att, v.astype(jnp.float32)
                ).astype(x.dtype)
            a = a.reshape(b, h, w, c)
            x = x + Conv2d(c, kernel=1, dtype=self.dtype, name="proj", **init_zero)(a)
            x = x * self.skip_scale
        return x
