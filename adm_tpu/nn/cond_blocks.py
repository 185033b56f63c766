"""Conditional-UNet building blocks (NHWC flax).

Functional equivalents of reference unet/cond_unet_sd.py:16-560 (shared by
cond_unet / cond_unet_t2i / text_cond_unet): sine position embeddings,
lucidrains-style weight-standardized ResnetBlocks, linear + full attention,
and the RelationNet windowed cross-attention that fuses backbone cond
features into the UNet at every scale.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


class SinusoidalPosEmb(nn.Module):
    dim: int

    def __call__(self, x: Array) -> Array:
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = x[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class GaussianFourierProjection(nn.Module):
    """Frozen random Fourier features (cond_unet_sd.py:396-405)."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.variable(
            "buffers",
            "W",
            lambda: jax.random.normal(self.make_rng("params"), (self.embedding_size,))
            * self.scale,
        ).value
        proj = x[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def position_embedding_sine(x: Array, num_pos_feats: Optional[int] = None) -> Array:
    """DETR-style sine embedding over an NHWC map (cond_unet_sd.py:16-66)."""
    b, h, w, c = x.shape
    n = (num_pos_feats or c) // 2
    y_embed = jnp.broadcast_to(
        jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None], (b, h, w)
    )
    x_embed = jnp.broadcast_to(
        jnp.arange(1, w + 1, dtype=jnp.float32)[None, None, :], (b, h, w)
    )
    dim_t = jnp.arange(n, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / n)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4
    ).reshape(b, h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4
    ).reshape(b, h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


# ---------------------------------------------------------------------------
# norms / convs
# ---------------------------------------------------------------------------


class ChannelLayerNorm(nn.Module):
    """Per-channel LayerNorm with scale only (cond_unet_sd.py:360-369)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * g).astype(x.dtype)


class WSConv(nn.Module):
    """Weight-standardized conv (cond_unet_sd.py:344-358)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        k32 = k.astype(jnp.float32)
        mean = jnp.mean(k32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k32, axis=(0, 1, 2), keepdims=True)
        k_std = ((k32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
        pad = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k_std,
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class Block(nn.Module):
    """WSConv -> GN -> (scale,shift) -> SiLU (cond_unet_sd.py:427-443)."""

    features: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, scale_shift=None) -> Array:
        x = WSConv(self.features, dtype=self.dtype, name="proj")(x)
        g = min(self.groups, x.shape[-1])
        x = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            self.dtype
        )
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return jax.nn.silu(x)


class ResnetBlock(nn.Module):
    """lucidrains ResnetBlock (cond_unet_sd.py:445-467)."""

    features: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, t_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if t_emb is not None:
            emb = nn.Dense(self.features * 2, dtype=self.dtype, name="mlp")(
                jax.nn.silu(t_emb)
            )
            emb = emb[:, None, None, :]
            scale_shift = jnp.split(emb, 2, axis=-1)
        h = Block(self.features, self.groups, dtype=self.dtype, name="block1")(
            x, scale_shift
        )
        h = Block(self.features, self.groups, dtype=self.dtype, name="block2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


class LinearAttention(nn.Module):
    """Efficient linear attention with LayerNorm epilogue
    (cond_unet_sd.py:506-533)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head).astype(jnp.float32)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, d)
        q = jax.nn.softmax(q, axis=-1) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)
        v = v / (h * w)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden).astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(out)
        return ChannelLayerNorm(name="out_norm")(out)


class Attention(nn.Module):
    """Full softmax attention (cond_unet_sd.py:535-556)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head).astype(jnp.float32)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        sim = jnp.einsum("bihd,bjhd->bhij", q * (self.dim_head**-0.5), k)
        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", att, v).reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(
            out.astype(x.dtype)
        )


class PreNormResidual(nn.Module):
    """Residual(PreNorm(fn)) composition (cond_unet_sd.py:326-333,370-378)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return self.fn(ChannelLayerNorm(name="norm")(x)) + x


# ---------------------------------------------------------------------------
# RelationNet: windowed cross-attention cond fusion
# ---------------------------------------------------------------------------


def _bilinear_resize(x: Array, size: Tuple[int, int]) -> Array:
    return jax.image.resize(x, (x.shape[0], *size, x.shape[-1]), method="bilinear")


def _bilinear_align_corners(x: Array, size: Tuple[int, int]) -> Array:
    """torch F.interpolate(..., align_corners=True) semantics:
    src = dst * (in-1)/(out-1) (jax.image.resize only does half-pixel)."""
    b, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x

    def coords(out_n, in_n):
        if out_n == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_n - 1)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        return i0, i1, (src - i0)

    y0, y1, fy = coords(oh, h)
    x0, x1, fx = coords(ow, w)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y0][
        :, :, x1
    ] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y1][
        :, :, x1
    ] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


class _BatchStatsNorm(nn.Module):
    """BatchNorm matching RelationNet's BatchNorm2d(momentum=0.03, eps=1e-3)
    (cond_unet_sd.py:247-254). Default: training-mode batch statistics
    (stateless — the TPU-native choice for training from scratch).
    frozen=True: inference affine only, with the checkpoint's running stats
    pre-folded into scale/bias by torch_convert (use fold_batchnorm with
    eps=1e-3) — exact BatchNorm2d.eval() for converted reference weights."""

    frozen: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        if self.frozen:
            return (x32 * scale + bias).astype(x.dtype)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias).astype(
            x.dtype
        )


class BasicAttentionLayer(nn.Module):
    """Windowed cross-attention: cond windows (Q) attend to feature windows
    (K/V), then bilinear-upsample back and fuse residually
    (cond_unet_sd.py:155-238)."""

    embed_dim: int = 128
    nhead: int = 8
    ffn_dim: int = 512
    window_size1: Tuple[int, int] = (4, 4)
    window_size2: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: Array, x2: Array) -> Array:
        # x1: cond (queries), x2: features (keys/values)
        b, h1, w1, c = x1.shape
        _, h2, w2, _ = x2.shape
        ws1, ws2 = self.window_size1, self.window_size2

        fused = jnp.concatenate(
            [_bilinear_align_corners(x1, (h2, w2)), x2], axis=-1
        )
        shortcut = x2 + nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="concat_conv"
        )(fused)
        g = min(8, self.embed_dim)
        shortcut = nn.GroupNorm(
            num_groups=g, epsilon=1e-5, dtype=jnp.float32, name="gn"
        )(shortcut).astype(x2.dtype)

        def pad_to(x, ws):
            ph = (ws[0] - x.shape[1] % ws[0]) % ws[0]
            pw = (ws[1] - x.shape[2] % ws[1]) % ws[1]
            return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))

        x1p = pad_to(x1, ws1)
        x2p = pad_to(x2, ws2)
        q_map = nn.avg_pool(x1p, ws1, strides=ws1)  # (b, h1/ws, w1/ws, c)
        k_map = nn.avg_pool(x2p, ws2, strides=ws2)
        qh, qw = q_map.shape[1:3]

        qg = q_map + position_embedding_sine(q_map).astype(q_map.dtype)
        kg = k_map + position_embedding_sine(k_map).astype(k_map.dtype)
        nq, nk = qh * qw, kg.shape[1] * kg.shape[2]
        qg = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_lin")(
            qg.reshape(b, nq, c)
        )
        kk = kg.reshape(b, nk, c)
        k_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_lin")(kk)
        v_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_lin")(kk)

        d = self.embed_dim // self.nhead
        qg = qg.reshape(b, nq, self.nhead, d).astype(jnp.float32)
        k_proj = k_proj.reshape(b, nk, self.nhead, d).astype(jnp.float32)
        v_proj = v_proj.reshape(b, nk, self.nhead, d).astype(jnp.float32)
        att = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", qg, k_proj), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v_proj).reshape(b, nq, self.embed_dim)
        out = out.reshape(b, qh, qw, self.embed_dim).astype(x1.dtype)

        x1_s = q_map + out
        # MLP (1x1 convs with ReLU, cond_unet_sd.py:135-152)
        y = nn.Conv(self.ffn_dim, (1, 1), dtype=self.dtype, name="mlp_fc1")(x1_s)
        y = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(
            jax.nn.relu(y)
        )
        x1_s = x1_s + y
        x1_s = _bilinear_align_corners(x1_s, (h2, w2))
        return shortcut + nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="out_conv"
        )(x1_s)


class RelationNet(nn.Module):
    """1x1+BN input convs + N BasicAttentionLayers (cond_unet_sd.py:240-279)."""

    embed_dim: int = 128
    nhead: int = 8
    layers: int = 1
    ffn_dim: int = 512
    window_size1: Tuple[int, int] = (4, 4)
    window_size2: Tuple[int, int] = (1, 1)
    bn_frozen: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Array, feat: Array) -> Array:
        cond = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="input_conv1")(
            cond
        )
        cond = _BatchStatsNorm(frozen=self.bn_frozen, name="input_bn1")(cond)
        feat = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="input_conv2")(
            feat
        )
        feat = _BatchStatsNorm(frozen=self.bn_frozen, name="input_bn2")(feat)
        for i in range(self.layers):
            feat = BasicAttentionLayer(
                embed_dim=self.embed_dim,
                nhead=self.nhead,
                ffn_dim=self.ffn_dim,
                window_size1=tuple(self.window_size1),
                window_size2=tuple(self.window_size2),
                dtype=self.dtype,
                name=f"attention_{i}",
            )(cond, feat)
        return feat


class SpatialAttGN(nn.Module):
    """GN -> Conv3x3 -> SpatialAtt decouple branch (cond_unet_sd.py:744-748)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from adm_tpu.nn.blocks import SpatialAtt

        g = min(8, max(self.features // 4, 1))
        h = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            x.dtype
        )
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv")(h)
        return SpatialAtt(dtype=self.dtype, name="att")(h)
