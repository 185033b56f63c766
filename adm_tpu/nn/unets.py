"""UNet zoo: ADM (Dhariwal) and DDPM++/NCSN++ (Song) backbones with DDM's
two-decoder decoupling, plus the EDMPrecond wrapper.

Capability-equivalent to reference unet/uncond_unet.py (two-decoder),
unet/uncond_unet_sd*.py (single-decoder, analytic eps branch, optional
skip-tuning), and unet/uncond_unet_2.py (const2 precondition table) — all
folded into ONE parameterized implementation instead of six near-identical
files:

  DhariwalUNet(..., n_decoders=1|2)
  SongUNet(..., n_decoders=1|2)
  EDMPrecond(variant='const'|'const2'|'cond', skip_tuning=False, ...)

Layout is NHWC; activations run in `dtype` (bf16 for TPU training) with
fp32 GroupNorm/softmax/precondition islands.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adm_tpu.nn import precond as precond_lib
from adm_tpu.nn.blocks import (
    Conv2d,
    GroupNorm,
    Linear,
    PositionalEmbedding,
    FourierEmbedding,
    SpatialAtt,
    UNetBlock,
)

Array = jax.Array


class _Decouple(nn.Module):
    """Bottleneck decoupling branch: Conv3x3 + SpatialAtt
    (reference unet/uncond_unet.py:500-507)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return SpatialAtt(dtype=self.dtype, name="att")(h)


def _skip_tuning_ratios(n: int) -> list:
    """Skip-tuning scales 0.5 + 0.5*i/(L-1), applied reversed
    (arXiv 2402.15170; reference unet/uncond_unet_sd_3.py:547-555)."""
    return [0.5 + 0.5 * i / (n - 1) for i in range(n)][::-1]


class DhariwalUNet(nn.Module):
    """ADM UNet with shared encoder and 1 or 2 decoupled decoders
    (reference unet/uncond_unet.py:450-581)."""

    img_resolution: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    out_mul: int = 1
    n_decoders: int = 2
    skip_tuning: bool = False
    use_flash_attention: bool = False
    use_pallas_attention: bool = True
    use_fused_block: bool = False
    use_hw_dropout: bool = True
    remat: bool = False
    # NON-PARITY perf knob (BASELINE.md round-2 lever (b)): round each
    # level's width up to a multiple of this, so convs run lane-aligned on
    # the 128-lane MXU (192 -> 256; 384 stays). Changes the parameter count
    # — a config choice, not a drop-in reparameterization. 0 = exact
    # reference widths.
    channel_round: int = 0
    dtype: jnp.dtype = jnp.float32

    def _width(self, c: int) -> int:
        r = self.channel_round
        return -(-c // r) * r if r else c

    @nn.compact
    def __call__(
        self,
        x: Array,
        noise_labels: Array,
        class_labels: Optional[Array] = None,
        augment_labels: Optional[Array] = None,
        *,
        deterministic: bool = True,
        mode: str = "full",
        cache: Optional[Tuple[Array, Tuple[Array, ...]]] = None,
    ) -> Tuple[Array, ...]:
        """mode: 'full' (default) runs encoder+decoders; 'encode' returns
        the (bottleneck, skips) cache; 'decode' consumes a cache instead of
        running the encoder — the encoder-propagation sampler trick of
        "Faster Diffusion" (arXiv 2312.09608, PAPERS.md): adjacent
        denoising steps change encoder features little, so the sampler can
        re-encode every k-th step and run decoder-only in between (the
        time embedding is always recomputed for the CURRENT step). All
        modes share parameters (explicit module names); encode+decode at
        one step is bit-identical to 'full'."""
        assert mode in ("full", "encode", "decode"), mode
        emb_channels = self.model_channels * self.channel_mult_emb
        init = dict(
            init_mode="kaiming_uniform",
            init_weight=math.sqrt(1 / 3),
            init_bias=math.sqrt(1 / 3),
        )
        init_zero = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)
        init_one = dict(init_mode="kaiming_uniform", init_weight=1.0, init_bias=0.0)
        # per-block rematerialization: trade recompute for activation memory
        # (static argnums: 0=self, 1=x, 2=emb, 3=deterministic)
        Block = nn.remat(UNetBlock, static_argnums=(3,)) if self.remat else UNetBlock
        block_kw = dict(
            emb_channels=emb_channels,
            channels_per_head=64,
            dropout=self.dropout,
            init_mode="kaiming_uniform",
            init_weight=math.sqrt(1 / 3),
            init_bias=math.sqrt(1 / 3),
            use_flash_attention=self.use_flash_attention,
            use_pallas_attention=self.use_pallas_attention,
            use_fused_block=self.use_fused_block,
            use_hw_dropout=self.use_hw_dropout,
            dtype=self.dtype,
        )

        # ---- mapping (uncond_unet.py:544-556) --------------------------
        emb = PositionalEmbedding(self.model_channels, name="map_noise")(noise_labels)
        if self.augment_dim:
            aug = (
                augment_labels
                if augment_labels is not None
                else jnp.zeros((x.shape[0], self.augment_dim), jnp.float32)
            )
            emb = emb + Linear(
                self.model_channels, use_bias=False, name="map_augment", **init_zero
            )(aug)
        emb = jax.nn.silu(Linear(emb_channels, name="map_layer0", **init)(emb))
        emb = Linear(emb_channels, name="map_layer1", **init)(emb)
        if self.label_dim:
            lab = (
                class_labels
                if class_labels is not None
                else jnp.zeros((x.shape[0], self.label_dim), jnp.float32)
            )
            if not deterministic and self.label_dropout:
                keep = (
                    jax.random.uniform(self.make_rng("dropout"), (x.shape[0], 1))
                    >= self.label_dropout
                )
                lab = lab * keep.astype(lab.dtype)
            emb = emb + Linear(
                emb_channels,
                use_bias=False,
                init_mode="kaiming_normal",
                init_weight=math.sqrt(self.label_dim),
                name="map_label",
            )(lab)
        emb = jax.nn.silu(emb).astype(self.dtype)

        x = x.astype(self.dtype)

        # ---- encoder (uncond_unet.py:483-496,559-564) -------------------
        if mode == "decode":
            x, skips = cache[0], list(cache[1])
        else:
            skips = []
            for level, mult in enumerate(self.channel_mult):
                res = self.img_resolution >> level
                cout = self._width(self.model_channels * mult)
                if level == 0:
                    x = Conv2d(
                        cout, kernel=3, dtype=self.dtype,
                        name=f"enc_{res}_conv", **init
                    )(x)
                    skips.append(x)
                else:
                    x = Block(
                        x.shape[-1], down=True, name=f"enc_{res}_down",
                        **block_kw
                    )(x, emb, deterministic)
                    skips.append(x)
                for idx in range(self.num_blocks):
                    x = Block(
                        cout,
                        attention=(res in self.attn_resolutions),
                        name=f"enc_{res}_block{idx}",
                        **block_kw,
                    )(x, emb, deterministic)
                    skips.append(x)
            if mode == "encode":
                return x, tuple(skips)
        cout = x.shape[-1]

        # ---- decoupling (uncond_unet.py:500-507,566-567) ----------------
        outs = []
        for d in range(self.n_decoders):
            h = _Decouple(cout, dtype=self.dtype, name=f"decouple{d + 1}")(x) + x
            dec_skips = list(skips)
            if self.skip_tuning:
                # reference scales at pop() time: deepest skip gets 0.5,
                # shallowest 1.0 (unet/uncond_unet_sd_3.py:547-555). In push
                # order that is exactly _skip_tuning_ratios (1.0 -> 0.5).
                ratios = _skip_tuning_ratios(len(dec_skips))
                dec_skips = [s * r for s, r in zip(dec_skips, ratios)]
            suffix = "" if d == 0 else "2"
            for level, mult in reversed(list(enumerate(self.channel_mult))):
                res = self.img_resolution >> level
                if level == len(self.channel_mult) - 1:
                    h = Block(
                        h.shape[-1],
                        attention=True,
                        name=f"dec{suffix}_{res}_in0",
                        **block_kw,
                    )(h, emb, deterministic)
                    h = Block(
                        h.shape[-1], name=f"dec{suffix}_{res}_in1", **block_kw
                    )(h, emb, deterministic)
                else:
                    h = Block(
                        h.shape[-1], up=True, name=f"dec{suffix}_{res}_up", **block_kw
                    )(h, emb, deterministic)
                for idx in range(self.num_blocks + 1):
                    h = jnp.concatenate([h, dec_skips.pop()], axis=-1)
                    h = Block(
                        self._width(self.model_channels * mult),
                        attention=(res in self.attn_resolutions),
                        name=f"dec{suffix}_{res}_block{idx}",
                        **block_kw,
                    )(h, emb, deterministic)
            h = GroupNorm(dtype=self.dtype, name=f"out_norm{suffix}")(h)
            out_ch = self.out_channels * (self.out_mul if d == 0 else 1)
            h = Conv2d(
                out_ch, kernel=3, dtype=self.dtype, name=f"out_conv{suffix}", **init_one
            )(jax.nn.silu(h))
            outs.append(h)
        return tuple(outs)


class SongUNet(nn.Module):
    """DDPM++/NCSN++ UNet with two-decoder decoupling
    (reference unet/uncond_unet.py:253-441)."""

    img_resolution: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "fourier"  # 'positional' (DDPM++) | 'fourier' (NCSN++)
    channel_mult_noise: int = 2
    encoder_type: str = "residual"  # 'standard' | 'skip' | 'residual'
    decoder_type: str = "standard"  # 'standard' | 'skip'
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    out_mul: int = 1  # drift-head channel multiplier (linear process K||C)
    n_decoders: int = 2
    skip_tuning: bool = False
    use_flash_attention: bool = False
    use_pallas_attention: bool = True
    use_fused_block: bool = False
    use_hw_dropout: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        noise_labels: Array,
        class_labels: Optional[Array] = None,
        augment_labels: Optional[Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[Array, ...]:
        assert self.embedding_type in ("fourier", "positional")
        assert self.encoder_type in ("standard", "skip", "residual")
        assert self.decoder_type in ("standard", "skip")
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        init = dict(init_mode="xavier_uniform", init_weight=1.0, init_bias=0.0)
        init_zero = dict(init_mode="xavier_uniform", init_weight=1e-5, init_bias=0.0)
        Block = nn.remat(UNetBlock, static_argnums=(3,)) if self.remat else UNetBlock
        block_kw = dict(
            emb_channels=emb_channels,
            num_heads=1,
            dropout=self.dropout,
            skip_scale=math.sqrt(0.5),
            eps=1e-6,
            resample_filter=tuple(self.resample_filter),
            resample_proj=True,
            adaptive_scale=False,
            init_mode="xavier_uniform",
            init_weight=1.0,
            init_bias=0.0,
            init_attn_weight=math.sqrt(0.2),
            use_flash_attention=self.use_flash_attention,
            use_pallas_attention=self.use_pallas_attention,
            use_fused_block=self.use_fused_block,
            use_hw_dropout=self.use_hw_dropout,
            dtype=self.dtype,
        )

        # ---- mapping (uncond_unet.py:380-392) ---------------------------
        if self.embedding_type == "positional":
            emb = PositionalEmbedding(noise_channels, endpoint=True, name="map_noise")(
                noise_labels
            )
        else:
            emb = FourierEmbedding(noise_channels, name="map_noise")(noise_labels)
        # swap sin/cos halves (uncond_unet.py:383)
        b = emb.shape[0]
        emb = jnp.flip(emb.reshape(b, 2, -1), axis=1).reshape(b, -1)
        if self.label_dim:
            lab = (
                class_labels
                if class_labels is not None
                else jnp.zeros((x.shape[0], self.label_dim), jnp.float32)
            )
            if not deterministic and self.label_dropout:
                keep = (
                    jax.random.uniform(self.make_rng("dropout"), (x.shape[0], 1))
                    >= self.label_dropout
                )
                lab = lab * keep.astype(lab.dtype)
            emb = emb + Linear(noise_channels, name="map_label", **init)(
                lab * math.sqrt(self.label_dim)
            )
        if self.augment_dim:
            aug = (
                augment_labels
                if augment_labels is not None
                else jnp.zeros((x.shape[0], self.augment_dim), jnp.float32)
            )
            emb = emb + Linear(
                noise_channels, use_bias=False, name="map_augment", **init
            )(aug)
        emb = jax.nn.silu(Linear(emb_channels, name="map_layer0", **init)(emb))
        emb = jax.nn.silu(Linear(emb_channels, name="map_layer1", **init)(emb))
        emb = emb.astype(self.dtype)

        x = x.astype(self.dtype)

        # ---- encoder (uncond_unet.py:297-320,394-408) -------------------
        skips = []
        aux = x
        cout = 0
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels
                x = Conv2d(
                    cout, kernel=3, dtype=self.dtype, name=f"enc_{res}_conv", **init
                )(x)
                skips.append(x)
            else:
                x = Block(
                    x.shape[-1], down=True, name=f"enc_{res}_down", **block_kw
                )(x, emb, deterministic)
                skips.append(x)
                if self.encoder_type == "skip":
                    aux = Conv2d(
                        aux.shape[-1],
                        kernel=0,
                        down=True,
                        resample_filter=tuple(self.resample_filter),
                        dtype=self.dtype,
                        name=f"enc_{res}_aux_down",
                    )(aux)
                    x = x + Conv2d(
                        x.shape[-1],
                        kernel=1,
                        dtype=self.dtype,
                        name=f"enc_{res}_aux_skip",
                        **init,
                    )(aux)
                    skips[-1] = x
                elif self.encoder_type == "residual":
                    aux = Conv2d(
                        x.shape[-1],
                        kernel=3,
                        down=True,
                        resample_filter=tuple(self.resample_filter),
                        fused_resample=True,
                        dtype=self.dtype,
                        name=f"enc_{res}_aux_residual",
                        **init,
                    )(aux)
                    x = (x + aux) / math.sqrt(2)
                    skips[-1] = x
                    aux = x
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                x = Block(
                    cout,
                    attention=(res in self.attn_resolutions),
                    name=f"enc_{res}_block{idx}",
                    **block_kw,
                )(x, emb, deterministic)
                skips.append(x)

        # ---- decoders (uncond_unet.py:323-330,334-378,409-441) ----------
        outs = []
        bottleneck = x
        for d in range(self.n_decoders):
            h = (
                _Decouple(
                    bottleneck.shape[-1], dtype=self.dtype, name=f"decouple{d + 1}"
                )(bottleneck)
                + bottleneck
            )
            suffix = "" if d == 0 else "2"
            dec_skips = list(skips)
            if self.skip_tuning:
                ratios = _skip_tuning_ratios(len(dec_skips))
                dec_skips = [s * r for s, r in zip(dec_skips, ratios)]
            aux_out = None
            for level, mult in reversed(list(enumerate(self.channel_mult))):
                res = self.img_resolution >> level
                if level == len(self.channel_mult) - 1:
                    h = Block(
                        h.shape[-1],
                        attention=True,
                        name=f"dec{suffix}_{res}_in0",
                        **block_kw,
                    )(h, emb, deterministic)
                    h = Block(
                        h.shape[-1], name=f"dec{suffix}_{res}_in1", **block_kw
                    )(h, emb, deterministic)
                else:
                    h = Block(
                        h.shape[-1], up=True, name=f"dec{suffix}_{res}_up", **block_kw
                    )(h, emb, deterministic)
                for idx in range(self.num_blocks + 1):
                    h = jnp.concatenate([h, dec_skips.pop()], axis=-1)
                    attn = idx == self.num_blocks and res in self.attn_resolutions
                    h = Block(
                        self.model_channels * mult,
                        attention=attn,
                        name=f"dec{suffix}_{res}_block{idx}",
                        **block_kw,
                    )(h, emb, deterministic)
                if self.decoder_type == "skip" or level == 0:
                    if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                        aux_out = Conv2d(
                            self.out_channels,
                            kernel=0,
                            up=True,
                            resample_filter=tuple(self.resample_filter),
                            dtype=self.dtype,
                            name=f"dec{suffix}_{res}_aux_up",
                        )(aux_out)
                    tmp = GroupNorm(
                        eps=1e-6, dtype=self.dtype, name=f"dec{suffix}_{res}_aux_norm"
                    )(h)
                    out_ch = self.out_channels * (self.out_mul if d == 0 else 1)
                    tmp = Conv2d(
                        out_ch,
                        kernel=3,
                        dtype=self.dtype,
                        name=f"dec{suffix}_{res}_aux_conv",
                        **init_zero,
                    )(jax.nn.silu(tmp))
                    aux_out = tmp if aux_out is None else tmp + aux_out
            outs.append(aux_out)
        return tuple(outs)


_MODEL_TYPES = {"DhariwalUNet": DhariwalUNet, "SongUNet": SongUNet}


class EDMPrecond(nn.Module):
    """Preconditioned wrapper producing (C_pred, eps_pred)
    (reference unet/uncond_unet.py:588-635 and the 5 sibling variants).

    variant selects the coefficient table:
      'const'  — sqrt(t)-noise table (uncond_unet.py / uncond_unet_sd.py)
      'const2' — t-noise table (uncond_unet_2.py / uncond_unet_sd_2/3.py)
    n_decoders=1 derives the eps branch analytically.
    """

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    sigma_data: float = 0.5
    model_type: str = "DhariwalUNet"
    variant: str = "const"
    precondition: bool = True
    n_decoders: int = 2
    out_mul: int = 1
    dtype: jnp.dtype = jnp.float32
    model_kwargs: dict = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        sigma: Array,
        class_labels: Optional[Array] = None,
        augment_labels: Optional[Array] = None,
        *,
        deterministic: bool = True,
        mode: str = "full",
        cache=None,
    ) -> Tuple[Array, Array]:
        """mode='encode' returns the inner UNet's (bottleneck, skips) cache
        for the c_in-scaled input; mode='decode' runs decoders-only over
        `cache`, with the time embedding and skip/out combination computed
        from the CURRENT (x, sigma) — the encoder-propagation sampler
        ("Faster Diffusion", arXiv 2312.09608). encode+decode at one step
        is bit-identical to 'full'. Requires model_type='DhariwalUNet'."""
        assert mode in ("full", "encode", "decode"), mode
        if mode != "full" and self.model_type != "DhariwalUNet":
            raise NotImplementedError(
                "the encode/decode split (encoder_reuse) is implemented "
                f"for DhariwalUNet only, not {self.model_type}"
            )
        x = x.astype(jnp.float32)
        sigma = jnp.asarray(sigma, jnp.float32)
        if sigma.ndim == 0:
            sigma = jnp.full((x.shape[0],), sigma)
        sigma_b = sigma.reshape(-1, 1, 1, 1)
        coeffs = precond_lib.COEFF_TABLES[self.variant](sigma_b)

        kwargs = dict(self.model_kwargs or {})
        model = _MODEL_TYPES[self.model_type](
            img_resolution=self.img_resolution,
            out_channels=self.img_channels,
            label_dim=self.label_dim,
            n_decoders=self.n_decoders,
            out_mul=self.out_mul,
            dtype=self.dtype,
            name="model",
            **kwargs,
        )
        mode_kw = {} if mode == "full" else {"mode": mode, "cache": cache}
        outs = model(
            (coeffs["c_in"] * x),
            coeffs["c_noise"].reshape(-1),
            class_labels=class_labels,
            augment_labels=augment_labels,
            deterministic=deterministic,
            **mode_kw,
        )
        if mode == "encode":
            return outs  # (bottleneck, skips) cache
        f_x = outs[0].astype(jnp.float32)
        f_y = outs[1].astype(jnp.float32) if self.n_decoders == 2 else None

        if not self.precondition:
            if f_y is None:
                d_x = f_x
                d_y = precond_lib.derive_noise_branch(self.variant, x, d_x, sigma_b)
                return d_x, d_y
            return f_x, f_y

        if self.out_mul != 1:
            # multi-output drift head (e.g. linear process K||C): apply the
            # skip/out combination per out_channels-sized slice.
            xs = jnp.concatenate([x] * self.out_mul, axis=-1)
            d_x = coeffs["c_skip1"] * xs + coeffs["c_out1"] * f_x
        else:
            d_x = coeffs["c_skip1"] * x + coeffs["c_out1"] * f_x
        if f_y is None:
            d_y = precond_lib.derive_noise_branch(self.variant, x, d_x, sigma_b)
        else:
            d_y = coeffs["c_skip2"] * x + coeffs["c_out2"] * f_y
        return d_x, d_y
