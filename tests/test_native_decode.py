"""Native C++ decode/resample core (adm_tpu/native + adm_tpu/data/native).

The TPU-side analogue of the reference's torch DataLoader C++ workers
(train_uncond_dpm.py:87): decode parity is bit-exact vs PIL (both sit on
libjpeg/libpng), resize matches PIL BILINEAR within the +-1 LSB of
Pillow's fixed-point coefficients, and the batch API flags corrupt files
per the retry contract (reference ddm/data.py:997-1004).
"""

import numpy as np
import pytest
from PIL import Image

from adm_tpu import native as core
from adm_tpu.data import native as nat


@pytest.fixture(scope="module")
def imgs(tmp_path_factory):
    if core.lib() is None:
        pytest.skip("native toolchain unavailable — PIL fallback in use")
    root = tmp_path_factory.mktemp("native")
    rng = np.random.RandomState(0)
    img = (rng.rand(97, 123, 3) * 255).astype(np.uint8)
    png, jpg = str(root / "t.png"), str(root / "t.jpg")
    Image.fromarray(img).save(png)
    Image.fromarray(img).save(jpg, quality=95)
    bad = str(root / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8\xffgarbage")
    return img, png, jpg, bad


def test_decode_parity(imgs):
    img, png, jpg, _ = imgs
    assert np.array_equal(nat.decode(png), img)
    pil_jpg = np.asarray(Image.open(jpg).convert("RGB"))
    assert np.array_equal(nat.decode(jpg), pil_jpg)


def test_resize_matches_pil_bilinear(imgs):
    img, *_ = imgs
    for size in [(32, 32), (64, 200), (200, 64), (97, 123)]:
        pil = np.asarray(
            Image.fromarray(img).resize((size[1], size[0]), Image.BILINEAR)
        )
        ours = nat.resize_rgb(img, size)
        diff = np.abs(pil.astype(int) - ours.astype(int)).max()
        assert diff <= 1, (size, diff)


def test_truncated_jpeg_rejected(imgs, tmp_path):
    """libjpeg only WARNS on premature EOF (gray fill); the retry contract
    needs a hard failure like PIL's — any decode warning is an error."""
    _, _, jpg, _ = imgs
    with open(jpg, "rb") as f:
        data = f.read()
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises(OSError):
        nat.decode(str(trunc))


def test_rgba_png_matches_pil_convert(imgs, tmp_path):
    """Alpha PNGs must DROP alpha like PIL convert('RGB') — deterministic,
    not composited over an uninitialized buffer."""
    rng = np.random.RandomState(1)
    rgba = (rng.rand(21, 17, 4) * 255).astype(np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(rgba, "RGBA").save(p)
    pil = np.asarray(Image.open(p).convert("RGB"))
    a = nat.decode(str(p))
    b = nat.decode(str(p))
    assert np.array_equal(a, pil)
    assert np.array_equal(a, b)


def test_decode_bytes(imgs):
    img, png, jpg, _ = imgs
    with open(png, "rb") as f:
        assert np.array_equal(nat.decode_bytes(f.read()), img)
    with open(jpg, "rb") as f:
        data = f.read()
    pil = np.asarray(Image.open(jpg).convert("RGB"))
    assert np.array_equal(nat.decode_bytes(data), pil)
    with pytest.raises(OSError):
        nat.decode_bytes(b"\xff\xd8\xffgarbage")


def test_batch_pool_and_corrupt_flags(imgs):
    img, png, jpg, bad = imgs
    batch, ok = nat.decode_resize_batch([png, bad, jpg], (48, 48), 4)
    assert batch.shape == (3, 48, 48, 3) and batch.dtype == np.uint8
    assert ok.tolist() == [True, False, True]
    ref = nat.resize_rgb(img, (48, 48))
    assert np.array_equal(batch[0], ref)


def test_load_image_uses_native_and_falls_back(imgs, tmp_path):
    img, png, _, bad = imgs
    from adm_tpu.data.image_folder import load_image, load_with_retry

    assert np.array_equal(load_image(png), img)
    # grayscale mode goes through PIL
    g = load_image(png, mode="L")
    assert g.shape == (97, 123)
    # corrupt file still raises -> load_with_retry substitutes a sample
    with pytest.raises(OSError):
        load_image(bad)
    out = load_with_retry(
        lambda i: load_image([bad, png][i]), 0, 2
    )
    assert out.shape == (97, 123, 3)
