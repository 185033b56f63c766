"""Task-paired datasets: SR, saliency, inpainting, edges, depth, sketch,
segmentation (reference ddm/data.py:339-1103).

Batch contracts match the reference (SURVEY.md section 2.7), NHWC:
  SRDataset       {'image': HR in [-1,1], 'cond': bicubic-down LR}
  DUTSDataset     {'image': 1ch gt mask, 'cond': rgb, 'img_name', 'ori_size'}
  InpaintDataset  {'image', 'cond' (masked img), 'ori_mask', 'img_name'}
  EdgeDataset     {'image': 1ch edges, 'cond': rgb}
  NYUDv2Depth     {'image': 1ch depth, 'cond': rgb}
  SketchDataset   {'image': rgb, 'cond': 1ch sketch}
  Cityscapes/ADE20K {'image': rgb, 'cond': seg map}
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from adm_tpu.data.image_folder import (
    list_images,
    load_image,
    random_crop,
    resize,
    to_neg_one_one,
)


class _PairedFolder:
    """img_folder + cond_folder paired by sorted order (reference pairs by
    basename; sorted order is equivalent for the shipped datasets)."""

    img_mode = "RGB"
    cond_mode = "RGB"
    image_is_cond_gt = False

    def __init__(
        self,
        img_folder: str,
        cond_folder: Optional[str] = None,
        image_size=(256, 256),
        augment_horizontal_flip: bool = False,
        **kwargs,
    ):
        self.img_paths = list_images(img_folder)
        self.cond_paths = list_images(cond_folder) if cond_folder else None
        if not self.img_paths:
            raise FileNotFoundError(f"no images under {img_folder}")
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.img_paths)

    def _load_pair(self, index):
        img = resize(load_image(self.img_paths[index], self.img_mode),
                     self.image_size)
        cond = None
        if self.cond_paths:
            cond = resize(
                load_image(self.cond_paths[index], self.cond_mode),
                self.image_size,
            )
        return img, cond

    def _maybe_flip(self, *arrays):
        if self.flip and np.random.rand() < 0.5:
            return tuple(a[:, ::-1].copy() if a is not None else None for a in arrays)
        return arrays

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img, cond = self._load_pair(index)
        img, cond = self._maybe_flip(img, cond)
        out = {"image": to_neg_one_one(self._as_chlast(img, self.img_mode))}
        if cond is not None:
            out["cond"] = to_neg_one_one(self._as_chlast(cond, self.cond_mode))
        return out

    @staticmethod
    def _as_chlast(a, mode):
        return a[..., None] if mode == "L" and a.ndim == 2 else a


class SRDataset:
    """Random-crop HR, bicubic x`scale` downsample as cond
    (ddm/data.py:594-722)."""

    def __init__(
        self,
        img_folder: str,
        image_size=(256, 256),
        scale: int = 4,
        augment_horizontal_flip: bool = True,
        **kwargs,
    ):
        self.paths = list_images(img_folder)
        self.image_size = tuple(image_size)
        self.scale = scale
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(np.random.randint(2**31))
        hr = random_crop(load_image(self.paths[index]), self.image_size, rng)
        if self.flip and np.random.rand() < 0.5:
            hr = hr[:, ::-1].copy()
        lr = resize(
            hr, (self.image_size[0] // self.scale, self.image_size[1] // self.scale),
            "bicubic",
        )
        return {
            "image": to_neg_one_one(hr),
            "cond": to_neg_one_one(resize(lr, self.image_size, "bicubic")),
        }


class ImageNetSR(SRDataset):
    """ImageNet SR with degradation pipeline (reference ddm/imagenet.py:26-390):
    center-crop to image_size then bicubic (or blurred-bicubic) down/up."""

    def __init__(self, *args, degradation: str = "bicubic", **kwargs):
        super().__init__(*args, **kwargs)
        self.degradation = degradation

    def __getitem__(self, index):
        from adm_tpu.data.image_folder import load_image

        img = load_image(self.paths[index])
        h, w = img.shape[:2]
        s = min(h, w)
        y, x = (h - s) // 2, (w - s) // 2
        hr = resize(img[y : y + s, x : x + s], self.image_size, "bicubic")
        if self.flip and np.random.rand() < 0.5:
            hr = hr[:, ::-1].copy()
        lr_size = (self.image_size[0] // self.scale, self.image_size[1] // self.scale)
        if self.degradation == "blur_bicubic":
            from scipy.ndimage import gaussian_filter

            hr_blur = gaussian_filter(hr.astype(np.float32), sigma=(1.0, 1.0, 0))
            lr = resize(hr_blur.astype(np.uint8), lr_size, "bicubic")
        else:
            lr = resize(hr, lr_size, "bicubic")
        return {
            "image": to_neg_one_one(hr),
            "cond": to_neg_one_one(resize(lr, self.image_size, "bicubic")),
        }


class SRDatasetTest(SRDataset):
    def __getitem__(self, index):
        hr = resize(load_image(self.paths[index]), self.image_size)
        lr = resize(
            hr, (self.image_size[0] // self.scale, self.image_size[1] // self.scale),
            "bicubic",
        )
        return {
            "image": to_neg_one_one(hr),
            "cond": to_neg_one_one(resize(lr, self.image_size, "bicubic")),
            "img_name": os.path.basename(self.paths[index]),
        }


class DUTSDataset(_PairedFolder):
    """Saliency: gt mask is the diffusion target, rgb the cond
    (ddm/data.py:953-1026)."""

    img_mode = "L"
    cond_mode = "RGB"

    def __init__(self, img_folder, cond_folder=None, gt_folder=None, **kwargs):
        # reference names: img_folder=rgb, gt=masks; allow both spellings
        cond = cond_folder or img_folder
        gt = gt_folder or kwargs.pop("mask_folder", None)
        if gt is None:
            raise ValueError("DUTSDataset needs gt_folder (saliency masks)")
        super().__init__(img_folder=gt, cond_folder=cond, **kwargs)

    def __getitem__(self, index):
        out = super().__getitem__(index)
        out["img_name"] = os.path.basename(self.img_paths[index])
        out["ori_size"] = np.asarray(self.image_size, np.int32)
        return out


class EdgeDataset(_PairedFolder):
    img_mode = "L"


class NYUDv2DepthDataset(_PairedFolder):
    img_mode = "L"


class SketchDataset(_PairedFolder):
    cond_mode = "L"


class CityscapesDataset(_PairedFolder):
    pass


class ADE20KDataset(_PairedFolder):
    pass


# ---------------------------------------------------------------------------
# Inpainting with generated free-form masks (ddm/data.py:339-476)
# ---------------------------------------------------------------------------


def random_rect_mask(shape: Tuple[int, int], rng: np.random.RandomState,
                     hole_range=(0.0, 1.0)) -> np.ndarray:
    """Random rectangles mask: 1 = kept, 0 = hole (ddm/data.py:405-440)."""
    h, w = shape
    mask = np.ones((h, w), np.float32)
    n_rects = rng.randint(1, 4)
    for _ in range(n_rects):
        rh = rng.randint(h // 8, h // 2)
        rw = rng.randint(w // 8, w // 2)
        y = rng.randint(0, h - rh + 1)
        x = rng.randint(0, w - rw + 1)
        mask[y : y + rh, x : x + rw] = 0.0
    return mask


def random_brush_mask(shape: Tuple[int, int], rng: np.random.RandomState,
                      max_strokes: int = 4) -> np.ndarray:
    """Free-form brush strokes (ddm/data.py:441-476, RandomBrush)."""
    h, w = shape
    mask = np.ones((h, w), np.float32)
    for _ in range(rng.randint(1, max_strokes + 1)):
        n_pts = rng.randint(4, 12)
        y, x = rng.randint(0, h), rng.randint(0, w)
        width = rng.randint(max(h // 32, 1), max(h // 8, 2))
        for _ in range(n_pts):
            ang = rng.uniform(0, 2 * np.pi)
            length = rng.randint(h // 16 + 1, h // 4 + 2)
            ny = int(np.clip(y + length * np.sin(ang), 0, h - 1))
            nx = int(np.clip(x + length * np.cos(ang), 0, w - 1))
            steps = max(abs(ny - y), abs(nx - x), 1)
            for s in range(steps + 1):
                cy = int(y + (ny - y) * s / steps)
                cx = int(x + (nx - x) * s / steps)
                y0, y1 = max(cy - width // 2, 0), min(cy + width // 2 + 1, h)
                x0, x1 = max(cx - width // 2, 0), min(cx + width // 2 + 1, w)
                mask[y0:y1, x0:x1] = 0.0
            y, x = ny, nx
    return mask


class InpaintDataset:
    """{'image', 'cond' (masked img), 'ori_mask', 'img_name'}
    (ddm/data.py:339-403)."""

    def __init__(
        self,
        img_folder: str,
        image_size=(256, 256),
        augment_horizontal_flip: bool = False,
        mask_type: str = "both",  # 'rect' | 'brush' | 'both'
        **kwargs,
    ):
        self.paths = list_images(img_folder)
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip
        self.mask_type = mask_type

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(np.random.randint(2**31))
        img = resize(load_image(self.paths[index]), self.image_size)
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
        if self.mask_type == "rect":
            mask = random_rect_mask(self.image_size, rng)
        elif self.mask_type == "brush":
            mask = random_brush_mask(self.image_size, rng)
        else:
            mask = random_rect_mask(self.image_size, rng) * random_brush_mask(
                self.image_size, rng
            )
        mask = mask[..., None]
        img_n = to_neg_one_one(img)
        return {
            "image": img_n,
            "cond": img_n * mask,
            "ori_mask": mask.astype(np.float32),
            "img_name": os.path.basename(self.paths[index]),
        }
