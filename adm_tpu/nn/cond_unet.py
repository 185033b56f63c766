"""Mask/image-conditioned UNet with RelationNet fusion (NHWC flax).

Capability match of reference unet/cond_unet_sd.py:591-883 (single-decoder)
and unet/cond_unet.py:592-918 (two-decoder), folded into one module:

  * backbone (swin/resnet/conv) extracts 4-scale cond features; 1x1
    `projects` align channel dims (cond_unet_sd.py:671-679)
  * RelationNet windowed cross-attention fuses cond into the UNet at every
    scale, down and up (cond_unet_sd.py:728-756)
  * lucidrains ResnetBlocks + LinearAttention; Gaussian-Fourier time embed
  * bottleneck decoupling into 1 or 2 decoders; 'cond' preconditioning
    (c_skip1=t-1, c_skip2=sqrt(t), c_out1=t/sqrt(t+1),
     c_out2=sqrt(1-t)/sqrt(1+t), c_in=1, c_noise=log t)
    with the single-decoder analytic eps branch x2=(x-(t-1)x1)/sqrt(t)
    (cond_unet_sd.py:808-816,878-883)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adm_tpu.nn.backbones import BACKBONES
from adm_tpu.nn.cond_blocks import (
    Attention,
    GaussianFourierProjection,
    LinearAttention,
    PreNormResidual,
    RelationNet,
    ResnetBlock,
    SpatialAttGN,
    _bilinear_resize,
)

Array = jax.Array


class CondUnet(nn.Module):
    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    cond_in_dim: int = 1
    channels: int = 1
    out_mul: int = 1
    resnet_block_groups: int = 8
    window_sizes1: Sequence[Sequence[int]] = ((16, 16), (8, 8), (4, 4), (2, 2))
    window_sizes2: Sequence[Sequence[int]] = ((16, 16), (8, 8), (4, 4), (2, 2))
    fourier_scale: float = 16.0
    cond_net: str = "swin"
    # 'gn' trains from scratch (TPU-friendly, stateless); 'frozen_bn' is the
    # exact BatchNorm2d-inference affine for reference/torchvision weights
    # converted with utils.torch_convert.convert_cond_unet_sd
    backbone_norm: str = "gn"
    precondition: bool = True
    n_decoders: int = 1
    dtype: jnp.dtype = jnp.float32

    # the cond backbone + projections depend ONLY on `cond`, which is
    # constant across a sampling loop — DDPM.sample caches them once per
    # call (EXACT, unlike the approximate encoder_reuse of nn/unets.py)
    supports_cond_cache = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Array,
        cond: Array,
        *,
        deterministic: bool = True,
        mode: str = "full",
        cache: Optional[Tuple[Array, Tuple[Array, ...]]] = None,
    ) -> Tuple[Array, Array]:
        """mode='cond_cache' returns (h0, hm): the backbone feature pyramid
        projected per level plus the stem-resolution map — everything that
        depends only on `cond` (x/time enter nothing before the stem).
        mode='main' consumes that cache and skips the backbone. 'full' is
        cond_cache + main in one call (the training/parity path)."""
        assert mode in ("full", "cond_cache", "main"), mode
        del deterministic  # dropout-free family (reference uses dropout=0.1
        # only inside BasicAttentionLayer MLP; omitted here)
        x = x.astype(jnp.float32)
        t = jnp.asarray(time, jnp.float32)
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t)
        tb = t.reshape(-1, 1, 1, 1)

        c_skip1 = tb - 1
        c_out1 = tb / jnp.sqrt(tb + 1)
        c_skip2 = jnp.sqrt(tb)
        c_out2 = jnp.sqrt(1 - tb) / jnp.sqrt(1 + tb)
        c_noise = jnp.log(t)

        x_clone = x
        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        # ---- cond backbone + projections (cond-only; cacheable) ---------
        if mode == "main":
            h0, hm = cache[0], list(cache[1])
        else:
            bb_cls, _ = BACKBONES[self.cond_net]
            bb_kw = (
                {"norm_mode": self.backbone_norm}
                if "norm_mode" in bb_cls.__dataclass_fields__ else {}
            )
            feats = bb_cls(
                dtype=self.dtype, name="init_conv_mask", **bb_kw
            )(cond)
            hm = [
                nn.Conv(
                    dims[i], (1, 1), dtype=self.dtype, name=f"projects_{i}"
                )(feats[i])
                for i in range(n_levels)
            ]
            h0 = _bilinear_resize(
                feats[0].astype(jnp.float32), x.shape[1:3]
            ).astype(self.dtype)
            if mode == "cond_cache":
                return h0, tuple(hm)

        # ---- stem --------------------------------------------------------
        x = jnp.concatenate([x.astype(self.dtype), h0], axis=-1)
        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype, name="init_conv")(x)
        g = min(init_dim // 4, 8)
        x = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32, name="init_norm")(x).astype(
            self.dtype
        )
        r = x

        # ---- time embedding ---------------------------------------------
        temb = GaussianFourierProjection(
            self.dim // 2, scale=self.fourier_scale, name="time_fourier"
        )(c_noise)
        time_dim = self.dim * 4
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp1")(
            temb.astype(self.dtype)
        )
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp2")(
            jax.nn.gelu(temb)
        )

        # ---- encoder ------------------------------------------------------
        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_levels - 1
            x = ResnetBlock(
                dim_in, self.resnet_block_groups, dtype=self.dtype,
                name=f"down_{ind}_block1",
            )(x, temb)
            skips.append(x)
            x = RelationNet(
                embed_dim=dims[ind],
                nhead=8,
                layers=1,
                ffn_dim=dims[ind] * 2,
                window_size1=tuple(self.window_sizes1[ind]),
                window_size2=tuple(self.window_sizes2[ind]),
                bn_frozen=self.backbone_norm == "frozen_bn",
                dtype=self.dtype,
                name=f"relation_down_{ind}",
            )(hm[ind], x)
            x = ResnetBlock(
                dim_in, self.resnet_block_groups, dtype=self.dtype,
                name=f"down_{ind}_block2",
            )(x, temb)
            x = PreNormResidual(
                LinearAttention(dtype=self.dtype, name=f"down_{ind}_attn_fn"),
                name=f"down_{ind}_attn",
            )(x)
            skips.append(x)
            if not is_last:
                x = nn.Conv(
                    dim_out, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"down_{ind}_downsample",
                )(x)
            else:
                x = nn.Conv(
                    dim_out, (3, 3), padding=1, dtype=self.dtype,
                    name=f"down_{ind}_downsample",
                )(x)

        # ---- middle -------------------------------------------------------
        mid_dim = dims[-1]
        x = ResnetBlock(
            mid_dim, self.resnet_block_groups, dtype=self.dtype, name="mid_block1"
        )(x, temb)
        x = PreNormResidual(
            Attention(dtype=self.dtype, name="mid_attn_fn"), name="mid_attn"
        )(x)
        x = ResnetBlock(
            mid_dim, self.resnet_block_groups, dtype=self.dtype, name="mid_block2"
        )(x, temb)

        # ---- decoder(s) ----------------------------------------------------
        dims_rev = dims[::-1]
        outs = []
        for d in range(self.n_decoders):
            suffix = "" if d == 0 else "2"
            hd = x + SpatialAttGN(
                mid_dim, dtype=self.dtype, name=f"decouple{d + 1}"
            )(x)
            dec_skips = list(skips)
            dec_hm = list(hm)
            for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
                is_last = ind == n_levels - 1
                hd = jnp.concatenate([hd, dec_skips.pop()], axis=-1)
                hd = ResnetBlock(
                    dim_out, self.resnet_block_groups, dtype=self.dtype,
                    name=f"up{suffix}_{ind}_block1",
                )(hd, temb)
                hd = RelationNet(
                    embed_dim=dims_rev[ind],
                    nhead=8,
                    layers=1,
                    ffn_dim=dims_rev[ind] * 2,
                    window_size1=tuple(self.window_sizes1[::-1][ind]),
                    window_size2=tuple(self.window_sizes2[::-1][ind]),
                    bn_frozen=self.backbone_norm == "frozen_bn",
                    dtype=self.dtype,
                    name=f"relation_up{suffix}_{ind}",
                )(dec_hm.pop(), hd)
                hd = jnp.concatenate([hd, dec_skips.pop()], axis=-1)
                hd = ResnetBlock(
                    dim_out, self.resnet_block_groups, dtype=self.dtype,
                    name=f"up{suffix}_{ind}_block2",
                )(hd, temb)
                hd = PreNormResidual(
                    LinearAttention(
                        dtype=self.dtype, name=f"up{suffix}_{ind}_attn_fn"
                    ),
                    name=f"up{suffix}_{ind}_attn",
                )(hd)
                if not is_last:
                    hd = jnp.repeat(jnp.repeat(hd, 2, axis=1), 2, axis=2)
                hd = nn.Conv(
                    dim_in, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up{suffix}_{ind}_upsample",
                )(hd)
            hd = jnp.concatenate([hd, r], axis=-1)
            hd = ResnetBlock(
                self.dim, self.resnet_block_groups, dtype=self.dtype,
                name=f"final_res_block{suffix}",
            )(hd, temb)
            out_dim = self.out_dim or self.channels
            mul = self.out_mul if d == 0 else 1
            hd = nn.Conv(
                out_dim * mul, (1, 1), dtype=self.dtype, name=f"final_conv{suffix}"
            )(hd)
            outs.append(hd.astype(jnp.float32))

        x1 = outs[0]
        if self.precondition:
            if self.out_mul != 1:
                xs = jnp.concatenate([x_clone] * self.out_mul, axis=-1)
                x1 = c_skip1 * xs + c_out1 * x1
            else:
                x1 = c_skip1 * x_clone + c_out1 * x1
        if self.n_decoders == 2:
            x2 = outs[1]
            if self.precondition:
                x2 = c_skip2 * x_clone + c_out2 * x2
        else:
            x2 = (x_clone - (tb - 1) * x1) / jnp.sqrt(tb)
        return x1, x2
