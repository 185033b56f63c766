"""Conditioning backbones: 4-scale feature extractors (NHWC flax).

The reference vendors torchvision models modified to return a 4-scale
feature list (unet/swin_transformer.py:412-425, unet/resnet.py:266-288,
unet/efficientnet.py:355-370). All live conditional configs use
`cond_net: swin` (Swin-B); resnet101 is provided for parity, and a light
conv backbone for tests/benches.

Pretrained torchvision weights need one-time offline conversion (tooling in
adm_tpu/utils/torch_convert.py); architectures here initialize randomly and
are trainable unless frozen via fix_bb.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Swin Transformer (Swin-B): embed 128, depths [2,2,18,2], heads [4,8,16,32]
# ---------------------------------------------------------------------------


def _window_partition(x: Array, ws: int) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_unpartition(windows: Array, ws: int, h: int, w: int) -> Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int):
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(ws), jnp.arange(ws), indexing="ij")
    )  # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, n, n
    rel = rel.transpose(1, 2, 0) + jnp.array([ws - 1, ws - 1])
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]  # n, n


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        # x: (num_windows*b, n, c)
        bw, n, c = x.shape
        ws = self.window_size
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.heads, c // self.heads)
        q, k, v = (
            qkv[:, :, 0].astype(jnp.float32),
            qkv[:, :, 1].astype(jnp.float32),
            qkv[:, :, 2].astype(jnp.float32),
        )
        scale = (c // self.heads) ** -0.5
        att = jnp.einsum("bihd,bjhd->bhij", q * scale, k)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.heads),
        )
        idx = _relative_position_index(ws)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, self.heads)
        att = att + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            att = att.reshape(bw // nw, nw, self.heads, n, n) + mask[
                None, :, None, :, :
            ]
            att = att.reshape(bw, self.heads, n, n)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", att, v).reshape(bw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.astype(x.dtype)
        )


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import numpy as np

        b, h, w, c = x.shape
        # torchvision semantics (vendored unet/swin_transformer.py:103-116):
        # the feature map is zero-padded UP to window multiples (the window
        # is never clipped; padded zeros attend), and the per-axis shift is
        # zeroed when the window covers the padded axis.
        ws = self.window_size
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = y.shape[1:3]
        sh = 0 if ws >= hp else self.shift
        sw = 0 if ws >= wp else self.shift

        mask = None
        if sh + sw > 0:
            y = jnp.roll(y, (-sh, -sw), axis=(1, 2))
            # static cross-window mask, exactly the reference's slice
            # arithmetic (unet/swin_transformer.py:136-149)
            img_mask = np.zeros((hp, wp), np.float32)
            h_sl = ((0, -ws), (-ws, -sh if sh else None), (-sh if sh else hp, None))
            w_sl = ((0, -ws), (-ws, -sw if sw else None), (-sw if sw else wp, None))
            cnt = 0
            for hs in h_sl:
                for wss in w_sl:
                    img_mask[hs[0]:hs[1], wss[0]:wss[1]] = cnt
                    cnt += 1
            mw = (
                img_mask.reshape(hp // ws, ws, wp // ws, ws)
                .transpose(0, 2, 1, 3)
                .reshape(-1, ws * ws)
            )
            mask = jnp.asarray(
                np.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0),
                jnp.float32,
            )

        windows = _window_partition(y, ws)
        att = WindowAttention(
            c, self.heads, ws, dtype=self.dtype, name="attn"
        )(windows, mask)
        y = _window_unpartition(att, ws, hp, wp)
        if sh + sw > 0:
            y = jnp.roll(y, (sh, sw), axis=(1, 2))
        y = y[:, :h, :w, :]
        x = x + y

        z = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(jax.nn.gelu(z, approximate=False))
        return x + z


class PatchMerging(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinBackbone(nn.Module):
    """Swin returning 4 stage features (unet/swin_transformer.py:412-425).

    Defaults are Swin-B; channels (embed*1,2,4,8) at strides (4,8,16,32).
    """

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed"
        )(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)
        feats = []
        for stage, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            for blk in range(depth):
                x = SwinBlock(
                    dim=x.shape[-1],
                    heads=heads,
                    window_size=self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{blk}",
                )(x)
            feats.append(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"merge{stage}")(x)
        return tuple(feats)


# ---------------------------------------------------------------------------
# ResNet-101 (bottleneck) 4-scale backbone (unet/resnet.py:166-290)
# ---------------------------------------------------------------------------


class _GNorm(nn.Module):
    """Backbone norm. mode='gn' (default): stateless GroupNorm, the right
    choice when training from scratch on TPU. mode='frozen_bn': per-channel
    affine with BN running statistics FOLDED in (scale=w/sqrt(var+eps),
    bias=b-mean*scale) — exact BatchNorm2d inference for converted
    torchvision weights (fold with utils.torch_convert.fold_batchnorm)."""

    mode: str = "gn"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.mode == "frozen_bn":
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)
        if self.mode == "batch_stats":
            # BatchNorm2d TRAIN-mode semantics (stateless): batch statistics
            # with the raw affine — the twin-training harness's exact match
            # for a torch backbone in .train() (running stats only affect
            # eval, never gradients)
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
            return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale
                    + bias).astype(x.dtype)
        g = 32
        while c % g:
            g //= 2
        return nn.GroupNorm(num_groups=g, dtype=jnp.float32)(x).astype(x.dtype)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    norm_mode: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = jax.nn.relu(_GNorm(self.norm_mode)(out))
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype,
        )(out)
        out = jax.nn.relu(_GNorm(self.norm_mode)(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = _GNorm(self.norm_mode)(out)
        if x.shape[-1] != self.features * 4 or self.stride != 1:
            x = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            x = _GNorm(self.norm_mode)(x)
        return jax.nn.relu(out + x)


class ResNetBackbone(nn.Module):
    """ResNet-101 layout: blocks (3,4,23,3); features at 256/512/1024/2048."""

    blocks: Sequence[int] = (3, 4, 23, 3)
    in_channels: int = 3
    norm_mode: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype
        )(x.astype(self.dtype))
        x = jax.nn.relu(_GNorm(self.norm_mode)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        width = 64
        for stage, n in enumerate(self.blocks):
            for blk in range(n):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Bottleneck(width, stride=stride, norm_mode=self.norm_mode, dtype=self.dtype)(x)
            feats.append(x)
            width *= 2
        return tuple(feats)


# ---------------------------------------------------------------------------
# EfficientNet-B7 (MBConv + SE) 4-scale backbone (unet/efficientnet.py:233-373;
# reference taps stages with 48/80/224/640 channels at strides 4/8/16/32)
# ---------------------------------------------------------------------------


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.silu(nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s))
        return x * s


class MBConv(nn.Module):
    features: int
    expand: int = 6
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    norm_mode: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = jax.nn.silu(_GNorm(self.norm_mode)(h))
        pad = self.kernel // 2
        h = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=pad, feature_group_count=mid, use_bias=False, dtype=self.dtype,
        )(h)
        h = jax.nn.silu(_GNorm(self.norm_mode)(h))
        h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), dtype=self.dtype)(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = _GNorm(self.norm_mode)(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class EfficientNetBackbone(nn.Module):
    """EfficientNet-B7 layout; returns the reference's 4 tap stages."""

    # (features, depth, stride, kernel) per stage — B7 scaling
    stages: Sequence[Tuple[int, int, int, int]] = (
        (32, 4, 1, 3),
        (48, 7, 2, 3),
        (80, 7, 2, 5),
        (160, 10, 2, 3),
        (224, 10, 1, 5),
        (384, 13, 2, 5),
        (640, 4, 1, 3),
    )
    taps: Sequence[int] = (1, 2, 4, 6)
    in_channels: int = 3
    norm_mode: str = "gn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        x = nn.Conv(
            64, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype
        )(x.astype(self.dtype))
        x = jax.nn.silu(_GNorm(self.norm_mode)(x))
        feats = []
        for si, (f, depth, stride, k) in enumerate(self.stages):
            for bi in range(depth):
                x = MBConv(
                    f,
                    expand=1 if si == 0 else 6,
                    kernel=k,
                    stride=stride if bi == 0 else 1,
                    norm_mode=self.norm_mode,
                    dtype=self.dtype,
                )(x)
            if si in self.taps:
                feats.append(x)
        return tuple(feats)


# ---------------------------------------------------------------------------
# light conv backbone (tests / benches)
# ---------------------------------------------------------------------------


class ConvBackbone(nn.Module):
    """Small strided-conv pyramid with the same 4-scale contract."""

    base: int = 32
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        x = x.astype(self.dtype)
        feats = []
        c = self.base
        x = nn.Conv(c, (4, 4), strides=(4, 4), dtype=self.dtype)(x)
        for i in range(4):
            x = jax.nn.silu(
                nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            )
            feats.append(x)
            if i < 3:
                c *= 2
                x = nn.Conv(
                    c, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"down{i}"
                )(x)
        return tuple(feats)


BACKBONES = {
    "swin": (SwinBackbone, 128),
    "resnet": (ResNetBackbone, 256),
    "effnet": (EfficientNetBackbone, 48),
    "conv": (ConvBackbone, 32),
}


def backbone_feature_dims(name: str) -> Tuple[int, ...]:
    if name == "effnet":
        return (48, 80, 224, 640)
    _, f = BACKBONES[name]
    return (f, f * 2, f * 4, f * 8)
