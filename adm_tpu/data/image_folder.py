"""Folder-based image datasets (reference ddm/data.py:145-296).

All return {'image': HWC float32 in [-1,1]} (NHWC; reference is CHW).
Host-side PIL/numpy only.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _is_image(name: str) -> bool:
    return name.lower().endswith(EXTS)  # case-insensitive: IMG_0001.JPG etc.


def list_images(folder: str, recursive: bool = True):
    out = []
    if recursive:
        for root, _, files in os.walk(folder):
            for f in sorted(files):
                if _is_image(f):
                    out.append(os.path.join(root, f))
    else:
        out = [
            os.path.join(folder, f)
            for f in sorted(os.listdir(folder))
            if _is_image(f)
        ]
    return sorted(out)


def load_image(path: str, mode: str = "RGB") -> np.ndarray:
    # RGB goes through the native C++ decoder when built (bit-exact vs
    # PIL for JPEG+PNG, tests/test_native_decode.py; GIL-free so the
    # loader's thread pool actually parallelizes); PIL covers everything
    # else and is the automatic fallback
    if mode == "RGB":
        from adm_tpu.data.native import decode

        try:
            return decode(path)
        except OSError:
            pass  # non-jpeg/png (bmp/webp) or corrupt: let PIL decide
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert(mode))


def resize(img: np.ndarray, size: Tuple[int, int], method: str = "bilinear"):
    # the hot path (uint8 RGB bilinear) uses the native triangle resampler
    # (PIL-compatible within ±1 LSB, GIL-free); masks/nearest/bicubic and
    # non-RGB stay on PIL
    if method == "bilinear" and img.dtype == np.uint8 and img.ndim == 3 \
            and img.shape[2] == 3:
        from adm_tpu import native as _native

        if _native.lib() is not None:
            from adm_tpu.data.native import resize_rgb

            return resize_rgb(img, size)
    from PIL import Image

    m = {"bilinear": Image.BILINEAR, "nearest": Image.NEAREST,
         "bicubic": Image.BICUBIC}[method]
    im = Image.fromarray(img if img.dtype == np.uint8 else img.astype(np.uint8))
    im = im.resize((size[1], size[0]), m)
    return np.asarray(im)


def random_crop(img: np.ndarray, size: Tuple[int, int], rng: np.random.RandomState):
    h, w = img.shape[:2]
    th, tw = size
    if h < th or w < tw:
        img = resize(img, (max(h, th), max(w, tw)))
        h, w = img.shape[:2]
    y = rng.randint(0, h - th + 1)
    x = rng.randint(0, w - tw + 1)
    return img[y : y + th, x : x + tw]


def to_neg_one_one(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return x * 2.0 - 1.0


def load_with_retry(load, index: int, n: int):
    """Corrupt-file resilience (reference ddm/data.py:997-1004): a truncated
    JPEG mid-run retries a random other sample instead of killing training."""
    for _ in range(100):
        try:
            return load(index)
        except (FileNotFoundError, OSError, ValueError):
            index = int(np.random.randint(n))
    raise RuntimeError("100 consecutive unreadable samples — check the dataset")


class ImageDataset:
    """Generic image folder (CelebA-HQ etc., ddm/data.py:145-185)."""

    def __init__(
        self,
        img_folder: str,
        image_size=(256, 256),
        augment_horizontal_flip: bool = False,
        exts: Optional[Sequence[str]] = None,
        **kwargs,
    ):
        self.paths = list_images(img_folder)
        if not self.paths:
            raise FileNotFoundError(f"no images under {img_folder}")
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return load_with_retry(self._load, index, len(self))

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        img = load_image(self.paths[index])
        img = resize(img, self.image_size)
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
        return {"image": to_neg_one_one(img)}


class ImageNetDataset(ImageDataset):
    """Folder + random-crop variant (ddm/data.py:187-240)."""

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(np.random.randint(2**31))
        img = load_image(self.paths[index])
        h, w = img.shape[:2]
        short = min(h, w)
        scale = max(self.image_size) / short
        img = resize(img, (round(h * scale), round(w * scale)))
        img = random_crop(img, self.image_size, rng)
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
        return {"image": to_neg_one_one(img)}


class LSUNDataset(ImageNetDataset):
    pass


class ImageMaskDataset:
    """Paired image+mask folders (ddm/data.py:298-337)."""

    def __init__(
        self,
        img_folder: str,
        mask_folder: Optional[str] = None,
        image_size=(256, 256),
        augment_horizontal_flip: bool = False,
        **kwargs,
    ):
        self.img_paths = list_images(img_folder)
        self.mask_paths = list_images(mask_folder) if mask_folder else None
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return load_with_retry(self._load, index, len(self))

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        img = resize(load_image(self.img_paths[index]), self.image_size)
        out = {}
        if self.mask_paths:
            mask = resize(
                load_image(self.mask_paths[index], "L"), self.image_size, "nearest"
            )[..., None]
            if self.flip and np.random.rand() < 0.5:
                img = img[:, ::-1].copy()
                mask = mask[:, ::-1].copy()
            out["cond"] = to_neg_one_one(mask)
        elif self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
        out["image"] = to_neg_one_one(img)
        return out
