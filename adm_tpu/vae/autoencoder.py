"""KL-regularized conv VAE (LDM-style first stage), NHWC flax.

Capability match of reference ddm/encoder_decoder.py:
  Encoder (:386-478) / Decoder (:480-588): ResnetBlocks (GN eps 1e-6 ->
  SiLU -> conv3x3), optional vanilla attention at configured resolutions
  (:168-221), stride-2 Downsample with asymmetric (0,1) padding (:78-97),
  nearest-neighbor 2x Upsample (:60-76).
  AutoencoderKL (:894-1029): quant/post_quant 1x1 convs around a
  DiagonalGaussianDistribution (:854-892); down_ratio = 2^(len(ch_mult)-1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _norm(x, name, dtype):
    # reference uses GroupNorm(32) with ch >= 32 everywhere
    # (encoder_decoder.py:56-57); fall back to the largest divisor for
    # small test configs.
    g = 32
    while x.shape[-1] % g:
        g //= 2
    return nn.GroupNorm(
        num_groups=g, epsilon=1e-6, dtype=jnp.float32, name=name
    )(x).astype(dtype)


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    use_conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = _norm(x, "norm1", self.dtype)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(
            jax.nn.silu(h)
        )
        h = _norm(h, "norm2", self.dtype)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(jax.nn.silu(h))
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            if self.use_conv_shortcut:
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_shortcut"
                )(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Vanilla single-head spatial attention (encoder_decoder.py:168-221)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = _norm(x, "norm", self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        att = jnp.einsum(
            "bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * (c**-0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", att, v.astype(jnp.float32))
        out = out.reshape(b, h, w, c).astype(x.dtype)
        return x + nn.Conv(
            c, (1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="proj_out",
        )(out)


class Downsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1) pad (encoder_decoder.py:78-97)."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                x.shape[-1],
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest 2x + conv3x3 (encoder_decoder.py:60-76)."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Encoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        res = self.resolution if isinstance(self.resolution, int) else self.resolution[0]
        curr_res = res
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"down_{i}_block_{j}",
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(
                    self.resamp_with_conv, dtype=self.dtype, name=f"down_{i}_downsample"
                )(h)
                curr_res //= 2
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic
        )
        h = _norm(h, "norm_out", self.dtype)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(
            jax.nn.silu(h)
        )


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    z_channels: int = 4
    tanh_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, z: Array, *, deterministic: bool = True, pre_out: bool = False
    ) -> Array:
        res = self.resolution if isinstance(self.resolution, int) else self.resolution[0]
        num_levels = len(self.ch_mult)
        curr_res = res // 2 ** (num_levels - 1)
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic
        )
        for i in reversed(range(num_levels)):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    self.ch * self.ch_mult[i],
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"up_{i}_block_{j}",
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(
                    self.resamp_with_conv, dtype=self.dtype, name=f"up_{i}_upsample"
                )(h)
                curr_res *= 2
        h = jax.nn.silu(_norm(h, "norm_out", self.dtype))
        if pre_out:
            # pre-conv_out activations: the GAN adaptive-weight trick grads
            # the last conv in isolation (ddm/loss.py:34-45)
            return h
        h = nn.Conv(
            self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return jnp.tanh(h) if self.tanh_out else h


# ---------------------------------------------------------------------------


class DiagonalGaussianDistribution:
    """Moments wrapper (encoder_decoder.py:854-892); channel-last split."""

    def __init__(self, parameters: Array, deterministic: bool = False):
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: Array) -> Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def kl(self) -> Array:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        return 0.5 * jnp.sum(
            (self.mean**2 + self.var - 1.0 - self.logvar).reshape(
                self.mean.shape[0], -1
            ),
            axis=-1,
        )

    def nll(self, sample: Array) -> Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        t = logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var
        return 0.5 * jnp.sum(t.reshape(t.shape[0], -1), axis=-1)

    def mode(self) -> Array:
        return self.mean


class AutoencoderKL(nn.Module):
    """Flax module: encode -> moments, decode <- latent
    (encoder_decoder.py:894-1029). GAN/LPIPS losses live in
    adm_tpu.vae.losses; the alternating trainer in adm_tpu.vae.trainer."""

    ddconfig: dict
    embed_dim: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("double_z", None)
        self.encoder = Encoder(double_z=True, dtype=self.dtype, **dd)
        dd_dec = {k: v for k, v in dd.items() if k != "in_channels"}
        self.decoder = Decoder(dtype=self.dtype, **dd_dec)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), name="post_quant_conv"
        )

    @property
    def down_ratio(self) -> int:
        return 2 ** (len(self.ddconfig["ch_mult"]) - 1)

    def encode(self, x: Array, *, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: Array, *, deterministic: bool = True) -> Array:
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def decode_pre(self, z: Array, *, deterministic: bool = True) -> Array:
        """Decode up to (but not including) conv_out — see apply_conv_out."""
        return self.decoder(
            self.post_quant_conv(z), deterministic=deterministic, pre_out=True
        )

    def __call__(
        self,
        x: Array,
        key: Optional[Array] = None,
        sample_posterior: bool = True,
        *,
        deterministic: bool = True,
    ):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior


def apply_conv_out(w: dict, h_pre: Array) -> Array:
    """Apply the decoder's final conv given its raw params
    (w = params['decoder']['conv_out'])."""
    y = jax.lax.conv_general_dilated(
        h_pre,
        w["kernel"].astype(h_pre.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + w["bias"].astype(h_pre.dtype)


@dataclasses.dataclass(frozen=True)
class FirstStage:
    """Frozen first-stage adapter used by LatentDiffusion
    (the encode/decode/down_ratio contract of ddm/ddm_const_2.py:437-441)."""

    module: AutoencoderKL

    @property
    def down_ratio(self) -> int:
        return self.module.down_ratio

    def init(self, rng: Array, image_size: Tuple[int, int], channels: int = 3):
        x = jnp.zeros((1, *image_size, channels), jnp.float32)
        return self.module.init(rng, x, jax.random.PRNGKey(0))

    def encode_sample(self, params: Any, x: Array, key: Array) -> Array:
        posterior = self.module.apply(params, x, method=AutoencoderKL.encode)
        return posterior.sample(key)

    def encode_mode(self, params: Any, x: Array) -> Array:
        posterior = self.module.apply(params, x, method=AutoencoderKL.encode)
        return posterior.mode()

    def decode(self, params: Any, z: Array) -> Array:
        return self.module.apply(params, z, method=AutoencoderKL.decode)
