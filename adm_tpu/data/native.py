"""numpy-facing API over the native decode core (adm_tpu/native).

All functions transparently fall back to PIL when the native library is
unavailable, so every dataset works without a toolchain. Enable/disable
globally with ADM_TPU_NO_NATIVE=1.

  decode(path)                 -> (H,W,3) uint8 RGB
  decode_resize(path, (h,w))   -> (h,w,3)  uint8, PIL-BILINEAR-compatible
  decode_resize_batch(paths, (h,w), n_threads)
                               -> ((N,h,w,3) uint8, ok bool mask)
                                  the GIL-free thread-pool fast path
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from adm_tpu import native as _native


def _pil_decode(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _pil_resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    im = Image.fromarray(img)
    return np.asarray(im.resize((size[1], size[0]), Image.BILINEAR))


def decode(path: str) -> np.ndarray:
    so = _native.lib()
    if so is None:
        return _pil_decode(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = so.adm_decode(str(path).encode(), ctypes.byref(out),
                       ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise OSError(f"native decode failed (rc={rc}): {path}")
    try:
        buf = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3))
        return buf.copy()
    finally:
        so.adm_free(out)


def decode_bytes(data: bytes) -> np.ndarray:
    """In-memory JPEG/PNG decode (webdataset tar members)."""
    so = _native.lib()
    if so is None:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = u8p()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = so.adm_decode_mem(data, len(data), ctypes.byref(out),
                           ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise OSError(f"native decode_mem failed (rc={rc})")
    try:
        return np.ctypeslib.as_array(out, shape=(h.value, w.value, 3)).copy()
    finally:
        so.adm_free(out)


def resize_rgb(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """PIL-BILINEAR-compatible triangle resample of an RGB uint8 array."""
    so = _native.lib()
    if so is None:
        return _pil_resize(img, size)
    img = np.ascontiguousarray(img, dtype=np.uint8)
    th, tw = int(size[0]), int(size[1])
    out = np.empty((th, tw, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    so.adm_resize_rgb(
        img.ctypes.data_as(u8p), img.shape[0], img.shape[1],
        out.ctypes.data_as(u8p), th, tw,
    )
    return out


def decode_resize(path: str, size: Tuple[int, int]) -> np.ndarray:
    so = _native.lib()
    if so is None:
        return _pil_resize(_pil_decode(path), size)
    return resize_rgb(decode(path), size)


def decode_resize_batch(
    paths: Sequence[str],
    size: Tuple[int, int],
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize a batch of files in the C++ thread pool.

    Returns (batch (N,h,w,3) uint8, ok (N,) bool). ok[i]=False marks an
    unreadable file (caller substitutes another sample — the corrupt-image
    retry contract, reference ddm/data.py:997-1004).
    """
    so = _native.lib()
    th, tw = int(size[0]), int(size[1])
    n = len(paths)
    if so is None:
        out = np.zeros((n, th, tw, 3), np.uint8)
        ok = np.zeros((n,), bool)
        for i, p in enumerate(paths):
            try:
                out[i] = _pil_resize(_pil_decode(p), size)
                ok[i] = True
            except OSError:
                pass
        return out, ok
    out = np.empty((n, th, tw, 3), np.uint8)
    okb = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    u8p = ctypes.POINTER(ctypes.c_uint8)
    so.adm_decode_resize_batch(
        arr, n, th, tw,
        out.ctypes.data_as(u8p), okb.ctypes.data_as(u8p), int(n_threads),
    )
    return out, okb.astype(bool)
