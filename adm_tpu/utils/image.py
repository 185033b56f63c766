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


def save_image(img, path: str):
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
