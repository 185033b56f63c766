"""Native (C++) host-runtime components, loaded via ctypes.

`lib()` lazily compiles adm_tpu/native/decode.cc with g++ into a cached
shared object and returns the ctypes handle, or None when no toolchain /
headers are available — callers (adm_tpu/data/native.py) fall back to PIL.

This is the TPU-side analogue of the reference's native runtime around the
compute path: torch's C++ DataLoader workers (train_uncond_dpm.py:87)
become a C++ decode/resample thread pool that runs GIL-free while JAX owns
the device. Kernels stay XLA/Pallas (the CUDA ops' replacement); host IO
is native here.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

log = logging.getLogger("adm_tpu")

_SRC = Path(__file__).parent / "decode.cc"
_LOCK = threading.Lock()
_LIB: object = "unset"  # tri-state: "unset" | None | ctypes.CDLL


def _cache_dir() -> Path:
    d = os.environ.get("ADM_TPU_NATIVE_CACHE")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "adm_tpu" / "native"


def _build() -> Optional[Path]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"libadm_decode-{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    # PID-unique tmp: concurrent processes (multi-host, trainer + eval CLI)
    # sharing the cache must not interleave writes into one tmp file — each
    # builds its own, and os.replace publishes whole files atomically
    tmp = out.with_suffix(f".so.tmp.{os.getpid()}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-ljpeg", "-lpng", "-pthread", "-o", str(tmp),
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.SubprocessError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        log.warning("native decode build failed (PIL fallback): %s",
                    detail.strip()[:500])
        return None
    os.replace(tmp, out)
    return out


def lib():
    """ctypes handle to the decode library, building on first call.
    None (with a one-time warning) when the toolchain is unavailable or
    ADM_TPU_NO_NATIVE=1."""
    global _LIB
    if _LIB != "unset":
        return _LIB
    with _LOCK:
        if _LIB != "unset":
            return _LIB
        if os.environ.get("ADM_TPU_NO_NATIVE"):
            _LIB = None
            return None
        path = _build()
        if path is None:
            _LIB = None
            return None
        so = ctypes.CDLL(str(path))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        so.adm_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        so.adm_decode.restype = ctypes.c_int
        so.adm_decode_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        so.adm_decode_mem.restype = ctypes.c_int
        so.adm_free.argtypes = [u8p]
        so.adm_free.restype = None
        so.adm_resize_rgb.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
        ]
        so.adm_resize_rgb.restype = ctypes.c_int
        so.adm_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p, u8p, ctypes.c_int,
        ]
        so.adm_decode_resize_batch.restype = ctypes.c_int
        _LIB = so
        return so
