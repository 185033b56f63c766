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
        img, _ = _shapes_image(self.image_size, self.seed, index)
        return {"image": img}


def _shapes_image(image_size, seed: int, index: int):
    """One procedural sample: (3ch image in [-1,1], foreground mask in [0,1])."""
    h, w = image_size
    rng = np.random.RandomState((seed * 1_000_003 + index) % 2**31)
    img = np.ones((h, w, 3), np.float32) * rng.uniform(-0.9, -0.3)
    fg = np.zeros((h, w), np.float32)
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
        fg = np.maximum(fg, mask)
    return np.clip(img, -1, 1), fg


class ShapesPairedDataset:
    """Procedural conditional pair: cond = 3ch shapes image, image = target.

    task='saliency' targets the 1-channel foreground mask (a DUTS-shaped
    contract: {'image': (H,W,1) in [-1,1], 'cond': (H,W,3)}, data/paired.py
    DUTSDataset); task='identity' targets the image itself (SR-style smoke).
    Used by the on-chip conditional exercises — no real paired data is
    mounted in this environment."""

    def __init__(self, image_size=(320, 320), length: int = 100_000,
                 seed: int = 0, task: str = "saliency", **kwargs):
        self.image_size = tuple(image_size)
        self.length = length
        self.seed = seed
        self.task = task

    def __len__(self):
        return self.length

    def __getitem__(self, index: int):
        img, fg = _shapes_image(self.image_size, self.seed, index)
        if self.task == "identity":
            return {"image": img, "cond": img.copy()}
        return {"image": (fg * 2 - 1)[..., None], "cond": img}


# caption vocabulary for ShapesCaptionedDataset: 6 primaries x 2 shapes.
# Colors in [-1,1] pixel scale (value*2-1 of RGB primaries).
CAPTION_COLORS = {
    "red": (1.0, -1.0, -1.0),
    "green": (-1.0, 1.0, -1.0),
    "blue": (-1.0, -1.0, 1.0),
    "yellow": (1.0, 1.0, -1.0),
    "cyan": (-1.0, 1.0, 1.0),
    "magenta": (1.0, -1.0, 1.0),
}
CAPTION_SHAPES = ("circle", "square")


class ShapesCaptionedDataset:
    """Procedural text2img pair: cond = token ids of 'a {color} {shape}',
    image = one shape of that color on a dark background.

    The t2i learning-evidence harness (tools/t2i_learn.py) trains the
    LAION-family `cond_unet_t2i` stack on this: the caption set is 12
    templates (6 colors x 2 shapes), tokenized with the CLIP-framed
    ByteTokenizer (nn/text_encoder.py) so no external BPE vocab file is
    needed. Batch contract matches WebdatasetReader's
    {'image': (H,W,3) in [-1,1], 'cond': (77,) int32} (data/webdata.py;
    reference t2i pipeline ddm/data.py + train_t2i_dpm recipe)."""

    def __init__(self, image_size=(64, 64), length: int = 100_000,
                 seed: int = 0, context_length: int = 77, **kwargs):
        from adm_tpu.nn.text_encoder import ByteTokenizer

        self.image_size = tuple(image_size)
        self.length = length
        self.seed = seed
        names = [(c, s) for c in CAPTION_COLORS for s in CAPTION_SHAPES]
        self.captions = [f"a {c} {s}" for c, s in names]
        self._specs = [(CAPTION_COLORS[c], s) for c, s in names]
        self._tokens = ByteTokenizer(context_length)(self.captions)

    def __len__(self):
        return self.length

    def __getitem__(self, index: int):
        h, w = self.image_size
        rng = np.random.RandomState((self.seed * 1_000_003 + index) % 2**31)
        k = rng.randint(len(self._specs))
        color, shape = self._specs[k]
        img = np.ones((h, w, 3), np.float32) * rng.uniform(-0.95, -0.75)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx, cy = rng.uniform(w * 0.3, w * 0.7), rng.uniform(h * 0.3, h * 0.7)
        r = rng.uniform(min(h, w) * 0.15, min(h, w) * 0.3)
        if shape == "circle":
            d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        else:
            d = np.maximum(np.abs(xx - cx), np.abs(yy - cy))
        mask = np.clip(r - d + 0.5, 0, 1)
        img = img * (1 - mask[..., None]) + np.asarray(
            color, np.float32
        ) * mask[..., None]
        return {"image": np.clip(img, -1, 1), "cond": self._tokens[k].copy()}
