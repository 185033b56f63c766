"""CIFAR-10 from the pickled python batches (reference ddm/data.py:22-142).

Returns dicts {'image': HWC float32 in [-1,1]} (+ optional {'class': int}),
matching the reference batch contract but NHWC (TPU layout) instead of CHW.
Pure numpy — the host data path has no torch dependency.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np


class CIFAR10:
    base_folder = "cifar-10-batches-py"
    train_list = [f"data_batch_{i}" for i in range(1, 6)]
    test_list = ["test_batch"]

    def __init__(
        self,
        img_folder: str,
        image_size=(32, 32),
        augment_horizontal_flip: bool = False,
        with_class: bool = False,
        normalize_to_neg_one_to_one: bool = True,
        train: bool = True,
        **kwargs,
    ):
        self.augment_horizontal_flip = augment_horizontal_flip
        self.with_class = with_class
        self.normalize = normalize_to_neg_one_to_one
        root = img_folder
        base = os.path.join(root, self.base_folder)
        if not os.path.isdir(base):
            base = root  # allow pointing directly at the batches dir
        files = self.train_list if train else self.test_list
        data, labels = [], []
        for fname in files:
            path = os.path.join(base, fname)
            with open(path, "rb") as f:
                entry = pickle.load(f, encoding="latin1")
            data.append(entry["data"])
            labels.extend(entry.get("labels", entry.get("fine_labels", [])))
        self.data = (
            np.vstack(data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        )  # NHWC uint8
        self.labels = np.asarray(labels, np.int32)

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img = self.data[index].astype(np.float32) / 255.0
        if self.augment_horizontal_flip and np.random.rand() < 0.5:
            img = img[:, ::-1, :].copy()
        if self.normalize:
            img = img * 2.0 - 1.0
        out = {"image": img}
        if self.with_class:
            out["class"] = self.labels[index]
        return out
