"""Sliding-window conditional inference with overlap averaging and
flip-test ensembling (reference sample_cond_ldm.py:220-332).

The crop grid is data-dependent on the host; every crop has the SAME static
shape (edge crops are shifted back, not shrunk — matching the reference's
y1 = max(y2 - h_crop, 0) logic), so the per-crop sampler compiles once.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def grid_starts(img: int, crop: int, stride: int):
    n = max(img - crop + stride - 1, 0) // stride + 1
    starts = []
    for i in range(n):
        s = min(i * stride, max(img - crop, 0))
        starts.append(s)
    return sorted(set(starts))


def slide_sample(
    sample_crop: Callable[[Array, Array], Array],
    cond: Array,
    crop_size: Tuple[int, int],
    stride: Tuple[int, int],
    key: Array,
    *,
    out_channels: int = 1,
    flip_test: bool = False,
    out_scale: int = 1,
) -> np.ndarray:
    """sample_crop(cond_crop, key) -> prediction in [0,1] of the crop
    (possibly out_scale x larger for SR, sample_cond_ldm.py:285-332).
    """
    b, h_img, w_img, _ = cond.shape
    h_crop, w_crop = crop_size
    h_stride, w_stride = stride
    ho, wo = h_img * out_scale, w_img * out_scale
    preds = np.zeros((b, ho, wo, out_channels), np.float64)
    count = np.zeros((b, ho, wo, 1), np.float64)

    for y1 in grid_starts(h_img, h_crop, h_stride):
        for x1 in grid_starts(w_img, w_crop, w_stride):
            y2, x2 = y1 + min(h_crop, h_img), x1 + min(w_crop, w_img)
            crop = cond[:, y1:y2, x1:x2, :]
            key, k1, k2 = jax.random.split(key, 3)
            out = sample_crop(crop, k1)
            if flip_test:
                out_f = sample_crop(jnp.flip(crop, axis=2), k2)
                out = 0.5 * out + 0.5 * jnp.flip(out_f, axis=2)
            oy1, ox1 = y1 * out_scale, x1 * out_scale
            oy2, ox2 = y2 * out_scale, x2 * out_scale
            preds[:, oy1:oy2, ox1:ox2, :] += np.asarray(out, np.float64)
            count[:, oy1:oy2, ox1:ox2, :] += 1
    assert (count == 0).sum() == 0, "sliding grid left uncovered pixels"
    return preds / count
