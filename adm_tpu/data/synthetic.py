"""Synthetic image dataset for benches/tests when no real data is mounted."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class SyntheticImages:
    def __init__(
        self,
        image_size: Tuple[int, int] = (32, 32),
        channels: int = 3,
        length: int = 50_000,
        seed: int = 0,
        with_cond: bool = False,
        cond_channels: int = 1,
        **kwargs,
    ):
        self.image_size = tuple(image_size)
        self.channels = channels
        self.length = length
        self.with_cond = with_cond
        self.cond_channels = cond_channels
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(index)
        h, w = self.image_size
        img = np.tanh(rng.randn(h, w, self.channels)).astype(np.float32)
        out = {"image": img}
        if self.with_cond:
            out["cond"] = np.tanh(rng.randn(h, w, self.cond_channels)).astype(
                np.float32
            )
        return out


class ShapesDataset:
    """Procedural learnable distribution (no real data in this environment):
    solid background + 1-3 anti-aliased colored circles/squares. A diffusion
    model trained on this visibly learns shape/color structure — used by the
    long-run 'does it learn' harness (tools/train_long.py)."""

    def __init__(self, image_size=(32, 32), length: int = 100_000,
                 seed: int = 0, **kwargs):
        self.image_size = tuple(image_size)
        self.length = length
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, index: int):
        h, w = self.image_size
        rng = np.random.RandomState((self.seed * 1_000_003 + index) % 2**31)
        img = np.ones((h, w, 3), np.float32) * rng.uniform(-0.9, -0.3)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        for _ in range(rng.randint(1, 4)):
            color = rng.uniform(-1, 1, 3).astype(np.float32)
            cx, cy = rng.uniform(4, w - 4), rng.uniform(4, h - 4)
            r = rng.uniform(3, min(h, w) / 3)
            if rng.rand() < 0.5:
                d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
                mask = np.clip(r - d + 0.5, 0, 1)  # anti-aliased edge
            else:
                d = np.maximum(np.abs(xx - cx), np.abs(yy - cy))
                mask = np.clip(r - d + 0.5, 0, 1)
            img = img * (1 - mask[..., None]) + color * mask[..., None]
        return {"image": np.clip(img, -1, 1)}
