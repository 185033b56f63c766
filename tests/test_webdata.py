"""Tar-shard reader: round-trip over generated shards, dark filter,
caption tokenization, process sharding."""

import io
import json
import tarfile

import numpy as np
import pytest

from adm_tpu.data.webdata import WebdatasetReader, filter_dark, web_batch_iterator


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    for s in range(2):
        with tarfile.open(d / f"shard-{s:04d}.tar", "w") as tf:
            for i in range(5):
                key = f"{s}_{i:05d}"
                arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
                if i == 4:
                    arr = np.zeros_like(arr)  # near-black, must be filtered
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = json.dumps({"caption": f"image number {i}"}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
    return str(d)


def test_reader_roundtrip(shards):
    reader = WebdatasetReader(shards + "/*.tar", image_size=(32, 32))
    it = iter(reader)
    seen = [next(it) for _ in range(8)]  # 8 of the 8 non-black images
    for item in seen:
        assert item["image"].shape == (32, 32, 3)
        assert item["image"].min() >= -1 and item["image"].max() <= 1
        assert item["cond"].shape == (77,)
        assert item["cond"].max() > 0  # caption tokenized


def test_dark_filter():
    assert not filter_dark(np.zeros((8, 8, 3), np.uint8))
    assert filter_dark(np.full((8, 8, 3), 128, np.uint8))


def test_web_batch_iterator(shards):
    reader = WebdatasetReader(shards + "/*.tar", image_size=(16, 16))
    batch = next(web_batch_iterator(reader, 4))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["cond"].shape == (4, 77)
    assert batch["cond"].dtype == np.int32


def test_process_sharding(shards):
    r0 = WebdatasetReader(shards + "/*.tar", process_index=0, process_count=2)
    r1 = WebdatasetReader(shards + "/*.tar", process_index=1, process_count=2)
    assert r0.shards != r1.shards
    assert len(r0.shards) == len(r1.shards) == 1
