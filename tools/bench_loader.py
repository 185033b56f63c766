"""Host data-loader throughput: native C++ pool vs PIL thread pool.

Generates a folder of 512x512 JPEGs, then measures decode+resize-to-256
img/s for (a) PIL in a ThreadPoolExecutor (the fallback path) and (b) the
native batch API (adm_tpu/native/decode.cc thread pool, GIL-free).

On a 1-vCPU host the two are decode-bound and tie (~66 img/s, both on
libjpeg); the native pool's advantage is on multi-core hosts where PIL
threads contend on the interpreter between decodes.

Run:  python tools/bench_loader.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from adm_tpu.data import native as nat

    d = Path("/tmp/adm_bench_imgs")
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = d / f"{i}.jpg"
        if not p.exists():
            Image.fromarray(
                (rng.rand(512, 512, 3) * 255).astype(np.uint8)
            ).save(p, quality=92)
        paths.append(str(p))

    def pil_one(p):
        with Image.open(p) as im:
            return np.asarray(
                im.convert("RGB").resize((256, 256), Image.BILINEAR)
            )

    for p in paths[:8]:
        pil_one(p)  # page cache warmup

    t0 = time.time()
    with ThreadPoolExecutor(os.cpu_count()) as ex:
        list(ex.map(pil_one, paths))
    t_pil = time.time() - t0

    t0 = time.time()
    batch, ok = nat.decode_resize_batch(paths, (256, 256), 0)
    t_nat = time.time() - t0
    assert ok.all()

    print(json.dumps({
        "n": n,
        "cpus": os.cpu_count(),
        "pil_pool_img_s": round(n / t_pil, 1),
        "native_pool_img_s": round(n / t_nat, 1),
        "speedup": round(t_pil / t_nat, 2),
    }))


if __name__ == "__main__":
    main()
