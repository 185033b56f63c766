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
