"""Encoder-propagation sampling on-chip: speed vs quality at a milestone.

Measures DDPM.sample(encoder_reuse=k) for k in {1, 2, 5} at the newest
flagship milestone: fenced img/s and proxy-FID ('192' features) against
the cached reference set — the serving-side counterpart of the
"Faster Diffusion" technique (arXiv 2312.09608, PAPERS.md). k=1 is the
exact reference 10-step sampler; the probe records the speedup and the
quality cost on the same calibrated anchor scale used by the trend.

Usage: python tools/sample_reuse_probe.py [milestone=newest] [n=1024]
Writes results/long_run/sample_reuse_probe.json + grids.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np


def main():
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from adm_tpu.cli._common import restore_train_state
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.metrics.fid import compute_fid
    from adm_tpu.metrics.metric import (
        extract_features,
        fid_feature_key,
        load_inception_params,
    )
    from adm_tpu.utils.image import save_image_grid
    from watchdog import newest_milestone

    out = Path("results/long_run")
    milestone = (
        int(sys.argv[1]) if len(sys.argv) > 1 else newest_milestone(out)
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    bs = 128
    if n < bs:
        raise SystemExit(
            f"n={n} < batch {bs} would sample nothing after the compile "
            "warmup — pass n >= 128"
        )
    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    state = restore_train_state(
        model, str(out / f"model-{milestone}"), required=True
    )
    inc = load_inception_params("random")
    feat = fid_feature_key("random")
    ref = np.load(out / "ref_feats_192_2048.npy")

    results = {"milestone": milestone, "n": n}
    probe_json = out / "sample_reuse_probe.json"
    if probe_json.exists():
        prev = json.loads(probe_json.read_text())
        if prev.get("milestone") == milestone and prev.get("n") == n:
            results.update(prev)

    for k in (1, 2, 5):
        name = f"reuse{k}"
        if name in results:
            print(f"[reuse_probe] {name}: cached", flush=True)
            continue
        sampler = jax.jit(
            lambda p, key, kk=k: model.sample(
                p, key, batch_size=bs, unnormalize=True, encoder_reuse=kk
            )
        )
        # warmup/compile outside the timed window; scalar transfer fences
        # (block_until_ready is unreliable on axon, CLAUDE.md)
        _ = float(jnp.sum(sampler(state.ema_params, jax.random.PRNGKey(0))))
        t0 = time.time()
        frames = []
        for i in range(n // bs):
            imgs = np.asarray(
                sampler(state.ema_params, jax.random.PRNGKey(900 + i))
            )
            frames.append((imgs * 255).clip(0, 255).astype(np.uint8))
        wall = time.time() - t0
        u8 = np.concatenate(frames)
        f = extract_features(u8, inc, (feat,), bs)[feat]
        fid = float(compute_fid(jnp.asarray(f), jnp.asarray(ref)))
        save_image_grid(
            frames[0][:16].astype(np.float32) / 255.0,
            str(out / f"reuse_{k}.png"), nrow=4,
        )
        results[name] = {
            "proxy_fid": round(fid, 4),
            "imgs_per_sec": round(n / wall, 1),
            "wall_s": round(wall, 1),
        }
        print(f"[reuse_probe] {name}: proxy_fid={fid:.4f} "
              f"{n / wall:.1f} img/s", flush=True)
        probe_json.write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
