"""Data layer: batch contracts of every dataset family (on generated PNGs)."""

import os

import numpy as np
import pytest

from adm_tpu.data import (
    CIFAR10,
    DUTSDataset,
    ImageDataset,
    InpaintDataset,
    SRDataset,
    batch_iterator,
)
from adm_tpu.data.paired import random_brush_mask, random_rect_mask


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    m = tmp_path_factory.mktemp("masks")
    for i in range(6):
        arr = (rng.rand(64, 64) * 255).astype(np.uint8)
        Image.fromarray(arr).save(m / f"mask_{i:03d}.png")
    return str(d), str(m)


@pytest.fixture(scope="module")
def cifar_dir(tmp_path_factory):
    import pickle

    d = tmp_path_factory.mktemp("cifar") / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        data = rng.randint(0, 256, (20, 3 * 32 * 32), np.uint8)
        entry = {"data": data, "labels": rng.randint(0, 10, 20).tolist()}
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump(entry, f)
    return str(d.parent)


def test_cifar10_contract(cifar_dir):
    ds = CIFAR10(cifar_dir, with_class=True)
    assert len(ds) == 100
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["image"].min() >= -1 and item["image"].max() <= 1
    assert "class" in item


def test_image_dataset(img_dir):
    d, _ = img_dir
    ds = ImageDataset(d, image_size=(32, 32))
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert -1 <= item["image"].min() and item["image"].max() <= 1


def test_sr_dataset(img_dir):
    d, _ = img_dir
    ds = SRDataset(d, image_size=(32, 32), scale=4)
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["cond"].shape == (32, 32, 3)  # upsampled back to HR size
    # cond must be blurrier than image (downsample round trip loses detail)
    assert not np.allclose(item["cond"], item["image"])


def test_duts_dataset(img_dir):
    d, m = img_dir
    ds = DUTSDataset(img_folder=d, gt_folder=m, image_size=(32, 32))
    item = ds[0]
    assert item["image"].shape == (32, 32, 1)  # gt saliency mask, 1ch
    assert item["cond"].shape == (32, 32, 3)  # rgb
    assert "img_name" in item and "ori_size" in item


def test_inpaint_dataset(img_dir):
    d, _ = img_dir
    ds = InpaintDataset(d, image_size=(64, 64))
    item = ds[0]
    assert set(item) == {"image", "cond", "ori_mask", "img_name"}
    mask = item["ori_mask"]
    assert mask.shape == (64, 64, 1)
    assert ((mask == 0) | (mask == 1)).all()
    assert (mask == 0).any(), "mask must contain holes"
    # cond is the masked image: zero inside holes
    np.testing.assert_allclose(item["cond"] * (1 - mask), 0.0, atol=1e-6)


def test_mask_generators():
    rng = np.random.RandomState(3)
    r = random_rect_mask((64, 64), rng)
    b = random_brush_mask((64, 64), rng)
    for m in (r, b):
        assert m.shape == (64, 64)
        assert 0 < m.mean() < 1  # some holes, some kept


def test_batch_iterator_sharding(img_dir):
    d, _ = img_dir
    ds = ImageDataset(d, image_size=(16, 16))
    it0 = batch_iterator(ds, 4, process_index=0, process_count=2, shuffle=False)
    it1 = batch_iterator(ds, 4, process_index=1, process_count=2, shuffle=False)
    b0, b1 = next(it0), next(it1)
    assert b0["image"].shape == (2, 16, 16, 3)  # local batch = 4/2
    assert not np.allclose(b0["image"], b1["image"])  # disjoint shards


def test_batch_iterator_workers_and_prefetch(img_dir):
    """Threaded decode + background prefetch yield identical batches to the
    synchronous path (same seed => same order)."""
    from adm_tpu.data.loader import prefetch_iterator

    d, _ = img_dir
    ds = ImageDataset(d, image_size=(16, 16))
    sync = batch_iterator(ds, 4, seed=7, shuffle=True)
    par = prefetch_iterator(
        batch_iterator(ds, 4, seed=7, shuffle=True, num_workers=2), depth=2
    )
    for _ in range(3):
        a, b = next(sync), next(par)
        np.testing.assert_allclose(a["image"], b["image"])


def test_prefetch_iterator_propagates_errors():
    from adm_tpu.data.loader import prefetch_iterator

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch_iterator(boom(), depth=1)
    assert next(it) == 1
    try:
        next(it)
    except ValueError as e:
        assert "producer failed" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_prefetch_iterator_finite():
    from adm_tpu.data.loader import prefetch_iterator

    assert list(prefetch_iterator(iter(range(5)), depth=2)) == list(range(5))


def test_collate_keeps_string_fields_and_shard_drops_them():
    """img_name/ori_size fields (DUTS/Sketch/Inpaint test datasets) collate
    as lists (torch default_collate behavior) instead of crashing, and
    shard_batch filters them before the jitted step."""
    from adm_tpu.data.loader import _collate
    from adm_tpu.parallel.mesh import make_mesh, shard_batch

    items = [
        {"image": np.zeros((4, 4, 3), np.float32), "img_name": f"{i}.jpg",
         "ori_size": (7, 9)}
        for i in range(2)
    ]
    batch = _collate(items)
    assert batch["img_name"] == ["0.jpg", "1.jpg"]
    assert batch["image"].shape == (2, 4, 4, 3)
    dev = shard_batch(make_mesh(n_data=2), batch)
    # strings dropped; numeric tuples (ori_size) legitimately pass through
    assert set(dev) == {"image", "ori_size"}


def test_batch_iterator_raises_on_tiny_shard():
    from adm_tpu.data.loader import batch_iterator
    from adm_tpu.data.synthetic import ShapesDataset

    ds = ShapesDataset(image_size=(8, 8), length=4)
    with pytest.raises(ValueError, match="shard"):
        next(batch_iterator(ds, batch_size=16, process_index=0,
                            process_count=2))


def test_cityscapes_contract(tmp_path):
    """Mask path DERIVED per image (labelTrainIds only), mask 'L'+1 uint8 /19
    one channel, nearest-resized (reference ddm/data.py:478-530)."""
    from PIL import Image

    from adm_tpu.data.paired import CityscapesDataset

    img_dir = tmp_path / "leftImg8bit" / "train" / "aachen"
    gt_dir = tmp_path / "gtFine" / "train" / "aachen"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        stem = f"aachen_00000{i}_000019_leftImg8bit"
        Image.fromarray(
            (rng.rand(64, 128, 3) * 255).astype(np.uint8)
        ).save(img_dir / f"{stem}.png")
        mask = np.full((64, 128), 5 + i, np.uint8)
        mask[0, 0] = 255  # ignore label -> wraps to 0 after +1
        Image.fromarray(mask).save(
            gt_dir / f"aachen_00000{i}_000019_gtFine_labelTrainIds.png"
        )
        # decoys that an rglob-pairing would pick up
        Image.fromarray(mask).save(
            gt_dir / f"aachen_00000{i}_000019_gtFine_color.png"
        )
        Image.fromarray(mask).save(
            gt_dir / f"aachen_00000{i}_000019_gtFine_instanceIds.png"
        )

    ds = CityscapesDataset(str(tmp_path), image_size=(32, 64))
    assert len(ds) == 2
    item = ds[1]
    assert item["image"].shape == (32, 64, 3)
    assert item["cond"].shape == (32, 64, 1)
    # label 6 -> (6+1)/19; nearest resize keeps exact values
    assert np.isclose(item["cond"].max(), 7.0 / 19.0)


def test_ade20k_contract(tmp_path):
    """Center-crop both, mask /150 one channel (ddm/data.py:531-592)."""
    from PIL import Image

    from adm_tpu.data.paired import ADE20KDataset

    img_dir = tmp_path / "images" / "training"
    ann_dir = tmp_path / "annotations" / "training"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(48, 80, 3) * 255).astype(np.uint8)).save(
        img_dir / "a.jpg"
    )
    Image.fromarray(np.full((48, 80), 30, np.uint8)).save(ann_dir / "a.png")

    ds = ADE20KDataset(str(tmp_path), image_size=(32, 32))
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["cond"].shape == (32, 32, 1)
    assert np.isclose(item["cond"].max(), 30.0 / 150.0)
