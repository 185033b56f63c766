"""Image grid saving (replaces torchvision.utils.save_image usage)."""

from __future__ import annotations

import math

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """images: (N, H, W, C) in [0,1] -> grid (H', W', C) uint8."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.ones(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return (np.clip(grid, 0, 1) * 255).astype(np.uint8)


def save_image_grid(images, path: str, nrow: int = 8):
    from PIL import Image

    grid = make_grid(np.asarray(images), nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)


# Cityscapes-style palette for colorizing segmentation conds
# (reference sample_cond_ldm.py:38-47,204-214)
PALETTE = np.array(
    [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32],
    ],
    np.uint8,
)


def colorize_segmentation(seg: np.ndarray, palette: np.ndarray = PALETTE):
    """(H, W) int labels -> (H, W, 3) uint8 colors."""
    seg = np.asarray(seg).astype(np.int64) % len(palette)
    return palette[seg]


def save_image(img, path: str):
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
