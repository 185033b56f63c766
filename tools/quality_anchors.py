"""Calibrate the proxy-FID trend scale (VERDICT r3 item 3a).

The long-run quality trend (results/long_run/quality_trend.json) is proxy-FID
on fixed random-init Inception '192' features — a relative metric with no
published scale. This computes the two ANCHOR rows that calibrate it, on the
SAME backend/features as the trend points:

  noise_anchor    proxy-FID(uniform-noise images  vs the reference set)
                  = "no learning at all" ceiling
  heldout_anchor  proxy-FID(held-out REAL shapes  vs the reference set)
                  = "perfect distribution match" floor (sampling noise only)

A milestone's proxy_fid reads on the [heldout, noise] scale; the BASELINE.md
acceptance gate is defined against these. Reference eval protocol analogue:
train_uncond_dpm.py:331-365 (FID vs gt stats at milestones).

Run (quiesces any live long-run trainer while extracting features):
  python tools/quality_anchors.py [n=2048]
Writes results/long_run/anchors.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out = REPO / "results/long_run"
    out.mkdir(parents=True, exist_ok=True)

    from bench import quiesce_chip

    with quiesce_chip():
        import jax
        import jax.numpy as jnp

        from adm_tpu.data.synthetic import ShapesDataset
        from adm_tpu.metrics.fid import compute_fid
        from adm_tpu.metrics.metric import (
            extract_features,
            fid_feature_key,
            load_inception_params,
        )

        feat = fid_feature_key("random")
        params = load_inception_params("random")
        data = ShapesDataset(image_size=(32, 32))

        def shapes_uint8(lo, hi):
            return np.stack([
                ((data[i]["image"] + 1) * 127.5).clip(0, 255).astype(np.uint8)
                for i in range(lo, hi)
            ])

        t0 = time.time()
        ref_cache = out / f"ref_feats_{feat}_{n}.npy"
        if ref_cache.exists():
            ref = np.load(ref_cache)
        else:
            ref = extract_features(
                shapes_uint8(0, n), params, (feat,), batch_size=128
            )[feat]
            np.save(ref_cache, ref)

        # held-out REAL shapes: indices disjoint from the reference set
        held = extract_features(
            shapes_uint8(n, 2 * n), params, (feat,), batch_size=128
        )[feat]
        # pure uniform noise images
        noise_imgs = np.random.RandomState(123).randint(
            0, 256, (n, 32, 32, 3), dtype=np.uint8
        )
        noi = extract_features(noise_imgs, params, (feat,), batch_size=128)[feat]

        anchors = {
            "feature": feat,
            "n": n,
            "heldout_anchor": round(float(compute_fid(
                jnp.asarray(held), jnp.asarray(ref))), 4),
            "noise_anchor": round(float(compute_fid(
                jnp.asarray(noi), jnp.asarray(ref))), 4),
            "backend": jax.devices()[0].platform,
            "wall_seconds": round(time.time() - t0, 1),
        }
    (out / "anchors.json").write_text(json.dumps(anchors, indent=1))
    print(json.dumps(anchors))


if __name__ == "__main__":
    main()
