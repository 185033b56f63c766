"""upfirdn2d: fused upsample -> FIR filter -> downsample -> pad.

TPU-native replacement for the reference's CUDA kernel
(unet/op/upfirdn2d_kernel.cu + unet/op/upfirdn2d.py): the whole pipeline is
ONE XLA convolution — `conv_general_dilated` with lhs_dilation=up (zero
insertion), window_strides=down, and explicit padding — which the TPU
compiler lowers to a single fused MXU pass; there is nothing left to fuse
by hand, so no bespoke Pallas kernel is warranted here (SURVEY.md 2.3).

Matches upfirdn2d_native semantics (unet/op/upfirdn2d.py:159-207):
correlation with the FLIPPED kernel over the zero-stuffed, padded input,
then stride-`down` decimation. NHWC layout, filter applied depthwise.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def setup_filter(f: Union[Sequence[float], Array], normalize: bool = True) -> Array:
    """1D taps -> normalized 2D separable kernel (as the reference's
    make_kernel, unet/op/upfirdn2d.py wrapper)."""
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    return f


def upfirdn2d(
    x: Array,
    kernel: Array,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Tuple[int, ...] = (0, 0),
) -> Array:
    """x: NHWC; kernel: (kh, kw); pad: (p0, p1) or (x0, x1, y0, y1)."""
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    if len(pad) == 2:
        pad_x0, pad_x1 = pad_y0, pad_y1 = pad
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    c = x.shape[-1]
    kh, kw = kernel.shape
    # correlation with flipped kernel == convolution with the kernel; XLA's
    # conv is a correlation, so flip explicitly to match the reference
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))

    # lhs_dilation inserts zeros BETWEEN samples; the reference zero-stuffs
    # AFTER each sample (up-1 trailing zeros), so fold those into the
    # trailing pad. Negative pads (crops) fold into conv padding directly.
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(down_y, down_x),
        padding=[(pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)],
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


# convenience wrappers matching unet/up_or_down_sampling.py usage


def upsample_2d(x: Array, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    kernel = setup_filter(k) * (gain * factor**2)
    p = kernel.shape[0] - factor
    return upfirdn2d(
        x, kernel, up=factor,
        pad=((p + 1) // 2 + factor - 1, p // 2, (p + 1) // 2 + factor - 1, p // 2),
    )


def downsample_2d(x: Array, k=(1, 3, 3, 1), factor: int = 2, gain: float = 1.0):
    kernel = setup_filter(k) * gain
    p = kernel.shape[0] - factor
    return upfirdn2d(
        x, kernel, down=factor,
        pad=((p + 1) // 2, p // 2, (p + 1) // 2, p // 2),
    )
