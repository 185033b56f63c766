"""Text-to-image UNet (reference unet/cond_unet_t2i.py:555-941).

Single decoder; a frozen/trainable CLIP-style text encoder produces one
pooled embedding, per-scale Linear projections feed CondAttention
(Q = adaptive-pooled image windows, K/V = the single text token) at every
scale down and up. Default precondition=False (reference :669) with the
analytic eps branch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adm_tpu.nn.cond_blocks import (
    Attention,
    GaussianFourierProjection,
    LinearAttention,
    PreNormResidual,
    ResnetBlock,
    SpatialAttGN,
    _bilinear_resize,
    position_embedding_sine,
)
from adm_tpu.nn.text_encoder import CLIPTextEncoder

Array = jax.Array


class CondAttention(nn.Module):
    """Multi-scale window attention onto a single text token
    (cond_unet_t2i.py:555-613)."""

    dim: int
    window_size_q: Tuple[int, int] = (4, 4)
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        # x (B,H,W,C); cond (B, D_text)
        b, h, w, c = x.shape
        wq = self.window_size_q
        shortcut = x
        # adaptive average pool to (wq_h, wq_w)
        q_s = jax.image.resize(x, (b, wq[0], wq[1], c), method="linear") \
            if (h % wq[0] or w % wq[1]) else nn.avg_pool(
                x, (h // wq[0], w // wq[1]), strides=(h // wq[0], w // wq[1])
            )
        qg = q_s + position_embedding_sine(q_s).astype(q_s.dtype)
        nq = wq[0] * wq[1]
        qg = nn.Dense(c, dtype=self.dtype, name="q_lin")(qg.reshape(b, nq, c))
        kg = cond[:, None, :]  # (B, 1, D)
        k = nn.Dense(c, dtype=self.dtype, name="k_lin")(kg)
        v = nn.Dense(c, dtype=self.dtype, name="v_lin")(kg)
        d = c // self.heads
        qg = qg.reshape(b, nq, self.heads, d).astype(jnp.float32)
        k = k.reshape(b, 1, self.heads, d).astype(jnp.float32)
        v = v.reshape(b, 1, self.heads, d).astype(jnp.float32)
        att = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", qg, k), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, wq[0], wq[1], c)
        q_s = q_s + o.astype(q_s.dtype)
        y = nn.Conv(2 * c, (1, 1), dtype=self.dtype, name="mlp_fc1")(q_s)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="mlp_fc2")(jax.nn.relu(y))
        q_s = q_s + y
        q_s = _bilinear_resize(q_s, (h, w))
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="out_conv")(q_s)
        g = min(8, c)
        out = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32, name="out_norm")(
            out
        ).astype(x.dtype)
        return shortcut + out


class Text2ImgUnet(nn.Module):
    dim: int = 64
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 4
    out_mul: int = 1
    resnet_block_groups: int = 8
    window_sizes1: Sequence[Sequence[int]] = ((16, 16), (8, 8), (4, 4), (2, 2))
    fourier_scale: float = 16.0
    text_dim: int = 512
    precondition: bool = False
    train_text_encoder: bool = False
    text_encoder_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    # the CLIP text tower + projections depend ONLY on `tokens`, constant
    # across a sampling loop — DDPM.sample caches them once per call
    # (exact; same mechanism as CondUnet's backbone cache)
    supports_cond_cache = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        time: Array,
        tokens: Array,
        *,
        deterministic: bool = True,
        mode: str = "full",
        cache=None,
    ) -> Tuple[Array, Array]:
        """mode='cond_cache' returns the per-level projected text context
        (everything token-only: CLIP tower + Dense projections);
        mode='main' consumes it and skips the tower. 'full' = both."""
        del deterministic
        assert mode in ("full", "cond_cache", "main"), mode
        x = x.astype(jnp.float32)
        t = jnp.asarray(time, jnp.float32)
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t)
        tb = t.reshape(-1, 1, 1, 1)
        c_skip1 = tb - 1
        c_out1 = tb / jnp.sqrt(tb + 1)
        c_noise = jnp.log(t)
        x_clone = x

        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        if mode == "main":
            hm = list(cache)
        else:
            # text embedding (frozen unless train_text_encoder)
            enc = CLIPTextEncoder(
                embed_dim=self.text_dim, dtype=self.dtype, name="clip_text",
                **(self.text_encoder_cfg or {}),
            )
            text_emb = enc(tokens)
            if not self.train_text_encoder:
                text_emb = jax.lax.stop_gradient(text_emb)

            hm = [
                nn.Dense(dims[i], dtype=self.dtype, name=f"projects_{i}")(
                    text_emb.astype(self.dtype)
                )
                for i in range(n_levels)
            ]
            if mode == "cond_cache":
                return tuple(hm)

        x = nn.Conv(init_dim, (7, 7), padding=3, dtype=self.dtype, name="init_conv")(
            x.astype(self.dtype)
        )
        r = x

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

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_levels - 1
            x = ResnetBlock(dim_in, self.resnet_block_groups, dtype=self.dtype,
                            name=f"down_{ind}_block1")(x, temb)
            skips.append(x)
            x = CondAttention(
                dim_in, tuple(self.window_sizes1[ind]), dtype=self.dtype,
                name=f"cond_att_down_{ind}",
            )(x, hm[ind])
            x = ResnetBlock(dim_in, self.resnet_block_groups, dtype=self.dtype,
                            name=f"down_{ind}_block2")(x, temb)
            x = PreNormResidual(LinearAttention(dtype=self.dtype),
                                name=f"down_{ind}_attn")(x)
            skips.append(x)
            stride = (1, 1) if is_last else (2, 2)
            kern = (3, 3) if is_last else (4, 4)
            x = nn.Conv(dim_out, kern, strides=stride, padding=1,
                        dtype=self.dtype, name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, self.resnet_block_groups, dtype=self.dtype,
                        name="mid_block1")(x, temb)
        x = PreNormResidual(Attention(dtype=self.dtype), name="mid_attn")(x)
        x = ResnetBlock(mid_dim, self.resnet_block_groups, dtype=self.dtype,
                        name="mid_block2")(x, temb)
        hd = x + SpatialAttGN(mid_dim, dtype=self.dtype, name="decouple1")(x)

        dims_rev = dims[::-1]
        dec_hm = list(hm)
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n_levels - 1
            hd = jnp.concatenate([hd, skips.pop()], axis=-1)
            hd = ResnetBlock(dim_out, self.resnet_block_groups, dtype=self.dtype,
                             name=f"up_{ind}_block1")(hd, temb)
            hd = CondAttention(
                dim_out, tuple(self.window_sizes1[::-1][ind]), dtype=self.dtype,
                name=f"cond_att_up_{ind}",
            )(hd, dec_hm.pop())
            hd = jnp.concatenate([hd, skips.pop()], axis=-1)
            hd = ResnetBlock(dim_out, self.resnet_block_groups, dtype=self.dtype,
                             name=f"up_{ind}_block2")(hd, temb)
            hd = PreNormResidual(LinearAttention(dtype=self.dtype),
                                 name=f"up_{ind}_attn")(hd)
            if not is_last:
                hd = jnp.repeat(jnp.repeat(hd, 2, axis=1), 2, axis=2)
            hd = nn.Conv(dim_in, (3, 3), padding=1, dtype=self.dtype,
                         name=f"up_{ind}_upsample")(hd)

        hd = jnp.concatenate([hd, r], axis=-1)
        hd = ResnetBlock(self.dim, self.resnet_block_groups, dtype=self.dtype,
                         name="final_res_block")(hd, temb)
        out_dim = self.out_dim or self.channels
        x1 = nn.Conv(out_dim * self.out_mul, (1, 1), dtype=self.dtype,
                     name="final_conv")(hd).astype(jnp.float32)

        if self.precondition:
            x1 = c_skip1 * x_clone + c_out1 * x1
        x2 = (x_clone - (tb - 1) * x1) / jnp.sqrt(tb)
        return x1, x2
