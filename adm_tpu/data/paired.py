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

import math
import os
from typing import Dict, Optional, Tuple

import numpy as np

from adm_tpu.data.image_folder import (
    list_images,
    load_image,
    load_with_retry,
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
        return load_with_retry(self._item, index, len(self))

    def _item(self, index: int) -> Dict[str, np.ndarray]:
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
        return load_with_retry(self._load, index, len(self))

    def _load(self, index: int) -> Dict[str, np.ndarray]:
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
        return load_with_retry(self._load, index, len(self))

    def _load(self, index):
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


_load_with_retry = load_with_retry


def _rglob_images(folder: str, exts=(".jpg",)):
    out = []
    for root, _, files in os.walk(folder):
        for f in sorted(files):
            if f.endswith(tuple(exts)) and not f.startswith("._"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _paired_resize(img, cond, size):
    return resize(img, size), resize(cond, size)


def _paired_flip(rng_draw: float, *arrays):
    if rng_draw < 0.5:
        return tuple(a[:, ::-1].copy() for a in arrays)
    return arrays


class DUTSDataset:
    """Saliency (ddm/data.py:953-1026): data_root/{DUTS-TR|DUTS-TE}, rgb
    *.jpg with masks in the sibling ...Image->...Mask folder as .png.
    Returns {'image': gt mask 1ch, 'cond': rgb, 'img_name', 'ori_size'}.

    Legacy kwargs (img_folder/cond_folder/gt_folder) pair two flat folders.
    """

    _SPLIT = {"train": "DUTS-TR", "test": "DUTS-TE"}

    def __init__(self, data_root=None, image_size=(384, 384),
                 augment_horizontal_flip=False, split="train",
                 img_folder=None, cond_folder=None, gt_folder=None, **kwargs):
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip and split == "train"
        if data_root is not None:
            folder = (
                os.path.join(data_root, self._SPLIT[split])
                if split in self._SPLIT
                else data_root
            )
            self.rgb_paths = _rglob_images(folder, (".jpg",))
            self.gt_paths = [
                os.path.join(
                    os.path.dirname(os.path.dirname(p)),
                    os.path.basename(os.path.dirname(p)).replace("Image", "Mask"),
                    os.path.basename(p).replace(".jpg", ".png"),
                )
                for p in self.rgb_paths
            ]
        else:
            gt = gt_folder or kwargs.pop("mask_folder", None)
            rgb = cond_folder or img_folder
            if gt is None or rgb is None:
                raise ValueError("DUTSDataset needs data_root or rgb+gt folders")
            self.rgb_paths = list_images(rgb)
            self.gt_paths = list_images(gt)
        if not self.rgb_paths:
            raise FileNotFoundError("no DUTS images found")

    def __len__(self):
        return len(self.rgb_paths)

    def _load(self, index):
        rgb = load_image(self.rgb_paths[index], "RGB")
        ori = rgb.shape[:2]
        gt = load_image(self.gt_paths[index], "L")
        rgb, gt = _paired_resize(rgb, gt, self.image_size)
        if self.flip:
            rgb, gt = _paired_flip(np.random.rand(), rgb, gt)
        return {
            "image": to_neg_one_one(gt)[..., None],
            "cond": to_neg_one_one(rgb),
            "img_name": os.path.basename(self.rgb_paths[index]),
            "ori_size": np.asarray(ori, np.int32),
        }

    def __getitem__(self, index):
        return _load_with_retry(self._load, index, len(self))


class EdgeDataset:
    """Edge maps (ddm/data.py:724-832): rglob under data_root, 1-channel
    edge images only ({'image': edge}); legacy img_folder(+cond_folder)
    keeps the paired edge+rgb form used by the cond smoke tests."""

    def __init__(self, data_root=None, image_size=(320, 320),
                 augment_horizontal_flip=False, img_folder=None,
                 cond_folder=None, **kwargs):
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip
        root = data_root or img_folder
        if root is None:
            raise ValueError("EdgeDataset needs data_root or img_folder")
        self.paths = _rglob_images(
            root, (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        )
        self.cond_paths = list_images(cond_folder) if cond_folder else None
        if not self.paths:
            raise FileNotFoundError(f"no edge images under {root}")

    def __len__(self):
        return len(self.paths)

    def _load(self, index):
        edge = load_image(self.paths[index], "L")
        edge = resize(edge, self.image_size)
        out = {}
        if self.cond_paths:
            cond = resize(load_image(self.cond_paths[index], "RGB"),
                          self.image_size)
            if self.flip:
                edge, cond = _paired_flip(np.random.rand(), edge, cond)
            out["cond"] = to_neg_one_one(cond)
        elif self.flip and np.random.rand() < 0.5:
            edge = edge[:, ::-1].copy()
        out["image"] = to_neg_one_one(edge)[..., None]
        return out

    def __getitem__(self, index):
        return _load_with_retry(self._load, index, len(self))


class NYUDv2DepthDataset:
    """Depth (ddm/data.py:834-888): data_root/split, rgb_*.jpg paired with
    sync_depth_*.png in the same folder, border crop (41,45,601,471), paired
    RandomCrop (train), depth/10000. {'image': depth 1ch, 'cond': rgb}.

    `resize_instead_of_crop` selects the Dataset2 variant (ddm/data.py:
    889-951): paired Resize for both train and test.
    """

    resize_instead_of_crop = False
    _CROP = (41, 45, 601, 471)  # PIL (left, upper, right, lower)

    def __init__(self, data_root=None, image_size=(320, 320),
                 augment_horizontal_flip=False, split="train",
                 img_folder=None, cond_folder=None, **kwargs):
        self.image_size = tuple(image_size)
        self.split = split
        self.flip = augment_horizontal_flip and split == "train"
        if data_root is not None:
            folder = (
                os.path.join(data_root, split)
                if split in ("train", "test")
                else data_root
            )
            self.rgb_paths = _rglob_images(folder, (".jpg",))
            self.depth_paths = [
                os.path.join(
                    os.path.dirname(p),
                    os.path.basename(p)
                    .replace("rgb_", "sync_depth_")
                    .replace(".jpg", ".png"),
                )
                for p in self.rgb_paths
            ]
        else:
            if img_folder is None or cond_folder is None:
                raise ValueError("NYUD needs data_root or depth+rgb folders")
            self.depth_paths = list_images(img_folder)
            self.rgb_paths = list_images(cond_folder)
        if not self.rgb_paths:
            raise FileNotFoundError("no NYUD images found")

    def __len__(self):
        return len(self.rgb_paths)

    @staticmethod
    def _load_depth(path):
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im).astype(np.float32)

    def _load(self, index):
        rgb = load_image(self.rgb_paths[index], "RGB")
        depth = self._load_depth(self.depth_paths[index])
        left, up, right, low = self._CROP
        if rgb.shape[0] >= low and rgb.shape[1] >= right:
            rgb = rgb[up:low, left:right]
            depth = depth[up:low, left:right]
        if self.resize_instead_of_crop or self.split == "test":
            rgb = resize(rgb, self.image_size)
            d8 = depth  # resize via PIL float-safe path
            from PIL import Image

            d8 = np.asarray(
                Image.fromarray(depth).resize(
                    (self.image_size[1], self.image_size[0]), Image.BILINEAR
                )
            )
            depth = d8
        elif self.split == "train":
            rng = np.random.RandomState(np.random.randint(2**31))
            h, w = rgb.shape[:2]
            th, tw = self.image_size
            y = rng.randint(0, max(h - th, 0) + 1)
            x = rng.randint(0, max(w - tw, 0) + 1)
            rgb = rgb[y : y + th, x : x + tw]
            depth = depth[y : y + th, x : x + tw]
        if self.flip:
            rgb, depth = _paired_flip(np.random.rand(), rgb, depth)
        depth = depth / 10000.0
        return {
            "image": (depth * 2.0 - 1.0).astype(np.float32)[..., None],
            "cond": to_neg_one_one(rgb),
            "img_name": os.path.basename(self.rgb_paths[index]),
        }

    def __getitem__(self, index):
        return _load_with_retry(self._load, index, len(self))


class NYUDv2DepthDataset2(NYUDv2DepthDataset):
    """Resize-based NYUD variant (ddm/data.py:889-951)."""

    resize_instead_of_crop = True


class SketchDataset:
    """Sketch->image (ddm/data.py:1028-1103): rgb under data_root/GT/<split>,
    sketch at the mirrored path under Sketch/. {'image': rgb, 'cond': sketch}.
    """

    _SPLIT = {"train": "train", "test": "val"}

    def __init__(self, data_root=None, image_size=(256, 256),
                 augment_horizontal_flip=False, split="train",
                 img_folder=None, cond_folder=None, **kwargs):
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip and split == "train"
        if data_root is not None:
            folder = (
                os.path.join(data_root, "GT", self._SPLIT[split])
                if split in self._SPLIT
                else data_root
            )
            self.rgb_paths = _rglob_images(folder, (".png",))
            self.sketch_paths = [
                p.replace(os.sep + "GT" + os.sep, os.sep + "Sketch" + os.sep)
                for p in self.rgb_paths
            ]
        else:
            if img_folder is None or cond_folder is None:
                raise ValueError("Sketch needs data_root or rgb+sketch folders")
            self.rgb_paths = list_images(img_folder)
            self.sketch_paths = list_images(cond_folder)
        if not self.rgb_paths:
            raise FileNotFoundError("no sketch-gt images found")

    def __len__(self):
        return len(self.rgb_paths)

    def _load(self, index):
        rgb = load_image(self.rgb_paths[index], "RGB")
        ori = rgb.shape[:2]
        sk = load_image(self.sketch_paths[index], "L")
        rgb, sk = _paired_resize(rgb, sk, self.image_size)
        if self.flip:
            rgb, sk = _paired_flip(np.random.rand(), rgb, sk)
        return {
            "image": to_neg_one_one(rgb),
            "cond": to_neg_one_one(sk)[..., None],
            "img_name": os.path.basename(self.rgb_paths[index]),
            "ori_size": np.asarray(ori, np.int32),
        }

    def __getitem__(self, index):
        return _load_with_retry(self._load, index, len(self))


class CityscapesDataset:
    """Seg-conditioned Cityscapes (ddm/data.py:478-530): leftImg8bit/<split>
    *.png images; the mask path is DERIVED per image as
    gtFine/<split>/<city>/<stem[:-12]>_gtFine_labelTrainIds.png (:496-497 —
    rglobbing gtFine would collect color/instanceIds/labelIds too and pair
    by index with the wrong files). Contract (:514-530): img bicubic-resized
    RGB in [-1,1]; mask 'L' + 1 in uint8 (255 ignore wraps to 0),
    NEAREST-resized, then float / 19, ONE channel."""

    def __init__(self, data_root, image_size=(128, 256), split="train",
                 augment_horizontal_flip=False, exts=(".png",), **kwargs):
        img_folder = os.path.join(data_root, "leftImg8bit", split)
        mask_folder = os.path.join(data_root, "gtFine", split)
        self.img_paths = _rglob_images(img_folder, tuple(exts))
        if not self.img_paths:
            raise FileNotFoundError(f"no images under {img_folder}")
        self.mask_paths = []
        for p in self.img_paths:
            city = os.path.basename(os.path.dirname(p))
            stem = os.path.splitext(os.path.basename(p))[0]
            self.mask_paths.append(os.path.join(
                mask_folder, city, f"{stem[:-12]}_gtFine_labelTrainIds.png"
            ))
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, index):
        return load_with_retry(self._load, index, len(self))

    def _load(self, index):
        img = resize(load_image(self.img_paths[index], "RGB"),
                     self.image_size, "bicubic")
        mask = load_image(self.mask_paths[index], "L").astype(np.uint8)
        mask = mask + np.uint8(1)  # uint8: ignore label 255 wraps to 0
        mask = resize(mask, self.image_size, "nearest")
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
            mask = mask[:, ::-1].copy()
        return {
            "image": to_neg_one_one(img),
            "cond": (mask.astype(np.float32) / 19.0)[..., None],
        }


class ADE20KDataset:
    """Seg-conditioned ADE20K (ddm/data.py:531-592): images/<split> *.jpg
    with annotations/<split>/<stem>.png masks. Both are center-cropped
    square FIRST (:567-583, score-sde preprocessing), then img
    bicubic / mask NEAREST resized; mask float / 150, ONE channel."""

    def __init__(self, data_root, image_size=(256, 256), split="training",
                 augment_horizontal_flip=False, exts=(".jpg",), **kwargs):
        img_folder = os.path.join(data_root, "images", split)
        mask_folder = os.path.join(data_root, "annotations", split)
        self.img_paths = _rglob_images(img_folder, tuple(exts))
        if not self.img_paths:
            raise FileNotFoundError(f"no images under {img_folder}")
        self.mask_paths = [
            os.path.join(
                mask_folder,
                os.path.splitext(os.path.basename(p))[0] + ".png",
            )
            for p in self.img_paths
        ]
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip

    def __len__(self):
        return len(self.img_paths)

    def __getitem__(self, index):
        return load_with_retry(self._load, index, len(self))

    def _load(self, index):
        img = load_image(self.img_paths[index], "RGB")
        mask = load_image(self.mask_paths[index], "L").astype(np.uint8)
        h, w = img.shape[:2]
        crop = min(h, w)
        ys, xs = (h - crop) // 2, (w - crop) // 2
        img = img[ys : ys + crop, xs : xs + crop]
        mask = mask[ys : ys + crop, xs : xs + crop]
        img = resize(img, self.image_size, "bicubic")
        mask = resize(mask, self.image_size, "nearest")
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
            mask = mask[:, ::-1].copy()
        return {
            "image": to_neg_one_one(img),
            "cond": (mask.astype(np.float32) / 150.0)[..., None],
        }


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


def _brush_strokes(s: int, max_tries: int, rng: np.random.RandomState,
                   min_num_vertex: int = 4, max_num_vertex: int = 18,
                   mean_angle: float = 2 * math.pi / 5,
                   angle_range: float = 2 * math.pi / 15,
                   min_width: int = 12, max_width: int = 48) -> np.ndarray:
    """Free-form brush strokes, faithful to the reference's RandomBrush
    (ddm/data.py:425-476): PIL polylines with ellipse joints, vertex angles
    alternating around mean_angle, normal-distributed step radii, and final
    per-axis coin-flip mirrors. RNG draws happen in the reference's exact
    order so a seeded run is bit-identical to a transcription of the
    original (tests/test_inpaint_masks.py). Returns uint8 (s, s), 1 = stroke.
    """
    from PIL import Image, ImageDraw

    avg_r = math.sqrt(2 * s * s) / 8
    canvas = Image.new("L", (s, s), 0)
    for _ in range(rng.randint(max_tries)):
        n_vertex = rng.randint(min_num_vertex, max_num_vertex)
        lo = mean_angle - rng.uniform(0, angle_range)
        hi = mean_angle + rng.uniform(0, angle_range)
        # even segments head back (2*pi - a), odd segments forward — the
        # zig-zag that gives reference strokes their character
        angles = [
            (2 * math.pi - rng.uniform(lo, hi)) if i % 2 == 0
            else rng.uniform(lo, hi)
            for i in range(n_vertex)
        ]
        pts = [(int(rng.randint(0, s)), int(rng.randint(0, s)))]
        for a in angles:
            r = np.clip(rng.normal(avg_r, avg_r // 2), 0, 2 * avg_r)
            pts.append((
                int(np.clip(pts[-1][0] + r * math.cos(a), 0, s)),
                int(np.clip(pts[-1][1] + r * math.sin(a), 0, s)),
            ))
        draw = ImageDraw.Draw(canvas)
        width = int(rng.uniform(min_width, max_width))
        draw.line(pts, fill=1, width=width)
        for x, y in pts:
            draw.ellipse((x - width // 2, y - width // 2,
                          x + width // 2, y + width // 2), fill=1)
        # the reference calls Image.transpose here but DISCARDS the result
        # (ddm/data.py:466-469) — a no-op upstream; the draws are still
        # consumed to keep RNG sequences aligned
        rng.random()
        rng.random()
    out = np.asarray(canvas, np.uint8)
    if rng.random() > 0.5:
        out = np.flip(out, 0)
    if rng.random() > 0.5:
        out = np.flip(out, 1)
    return out


def free_form_mask(s: int, rng: np.random.RandomState,
                   hole_range: Tuple[float, float] = (0.0, 1.0)) -> np.ndarray:
    """The reference's full mask generator (ddm/data.py:404-424): overhanging
    random rectangles at two scales + brush strokes, with hole-ratio
    rejection sampling. Returns float32 (s, s), 1 = kept, 0 = hole; the
    hole fraction always lands strictly inside hole_range (so an untouched
    all-ones mask is rejected at the default (0, 1) range too).

    Fidelity note (ADVICE r3): bit-exact to the reference at its only used
    range, the default (0, 1) (coef=1). For NARROW public hole_range values
    where a stamp category's budget floors to <=1 (coef < 0.5), each such
    category runs exactly ONCE per attempt instead of the reference
    np.random.randint(budget)'s 0..budget-1 draws — a deliberate deviation
    (randint(0) raises; an all-zero budget spins the rejection loop
    forever)."""
    coef = min(hole_range[0] + hole_range[1], 1.0)
    # np.random.randint(0) raises, and an all-zero draw budget would make
    # the rejection loop spin forever on an untouched mask. The reference
    # only ever calls this with the default range (coef=1); hole_range is a
    # public knob here, so for narrow ranges (coef < 0.5) each category
    # falls back to exactly one attempt. Draw sequence is unchanged at the
    # reference's coef=1.
    def n_draws(budget: int) -> int:
        return rng.randint(budget) if budget > 1 else 1

    while True:
        mask = np.ones((s, s), np.uint8)

        def stamp(max_size):
            w, h = rng.randint(max_size), rng.randint(max_size)
            hw, hh = w // 2, h // 2
            x = rng.randint(-hw, s - w + hw)
            y = rng.randint(-hh, s - h + hh)
            mask[max(y, 0): min(y + h, s), max(x, 0): min(x + w, s)] = 0

        for _ in range(n_draws(int(4 * coef))):
            stamp(s // 2)
        for _ in range(n_draws(int(2 * coef))):
            stamp(s)
        mask = np.logical_and(
            mask, 1 - _brush_strokes(s, max(int(8 * coef), 2), rng)
        )
        hole = 1.0 - np.mean(mask)
        if hole_range[0] < hole < hole_range[1]:
            return mask.astype(np.float32)


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
        # 'free_form' = the reference generator (rect stamps + PIL brush
        # strokes + hole-ratio rejection, ddm/data.py:404-476);
        # 'rect' | 'brush' | 'both' = simplified fast generators (opt-in)
        mask_type: str = "free_form",
        hole_range: Tuple[float, float] = (0.0, 1.0),
        **kwargs,
    ):
        self.paths = list_images(img_folder)
        self.image_size = tuple(image_size)
        self.flip = augment_horizontal_flip
        self.mask_type = mask_type
        self.hole_range = tuple(hole_range)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return load_with_retry(self._load, index, len(self))

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(np.random.randint(2**31))
        img = resize(load_image(self.paths[index]), self.image_size)
        if self.flip and np.random.rand() < 0.5:
            img = img[:, ::-1].copy()
        if self.mask_type == "free_form":
            assert self.image_size[0] == self.image_size[1], (
                "free_form masks are square (reference center-crops first)"
            )
            mask = free_form_mask(self.image_size[0], rng, self.hole_range)
        elif self.mask_type == "rect":
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
