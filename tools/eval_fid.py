"""Protocol-scale FID + ISC + KID eval loop, on-chip (VERDICT r2 item 1a,
r3 item 7).

Reference protocol: 50,000 EMA samples (10 sampling steps) scored against
the train set with InceptionV3 (train_uncond_dpm.py:363-365,
configs/cifar10/ddm_uncond_const_uncond_unet.yaml:67-74); the fidelity CLI
surface additionally exposes ISC and KID (reference metrics/metric.py:19,
sample_uncond.py:177-180). This runs that exact loop on the flagship
long-run checkpoint: batched jitted sampling -> on-device Inception
features (pool + logits taps in ONE pass) -> closed-form Fréchet distance,
10-split inception score and 100x1000 unbiased-MMD^2 KID, recording
sampling and feature-extraction throughput.

Weights: ADM_TPU_INCEPTION_WEIGHTS (real 2015-12-05 file -> real FID) or
"random" (default here): fixed random-init features, a relative
quality/trend metric (see adm_tpu/metrics/metric.py).

Usage: python tools/eval_fid.py [n_samples=50000] [milestone=newest]
Writes results/long_run/fid_eval.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main():
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from adm_tpu.cli._common import restore_train_state
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.data import ShapesDataset
    from adm_tpu.metrics.fid import compute_fid
    from adm_tpu.metrics.isc import inception_score
    from adm_tpu.metrics.kid import kernel_inception_distance
    from adm_tpu.metrics.metric import (
        extract_features,
        fid_feature_key,
        load_inception_params,
    )
    from watchdog import newest_milestone

    out = Path("results/long_run")
    milestone = (
        int(sys.argv[2]) if len(sys.argv) > 2 else newest_milestone(out)
    )
    assert milestone > 0, "no milestone checkpoint under results/long_run"
    bs = 128
    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    state = restore_train_state(
        model, str(out / f"model-{milestone}"), required=True
    )
    weights = os.environ.get("ADM_TPU_INCEPTION_WEIGHTS", "random")
    inc = load_inception_params(weights)
    feat = fid_feature_key(weights)  # '192' in proxy mode (collapse, see metric.py)

    taps = (feat, "logits_unbiased")  # fid/kid pool + isc logits, one pass
    sampler = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=bs, unnormalize=True)
    )
    # warm both programs (compile excluded from the timings)
    warm = np.asarray(sampler(state.ema_params, jax.random.PRNGKey(0)))
    _ = extract_features(
        (warm * 255).clip(0, 255).astype(np.uint8), inc, taps, bs
    )

    # ---- reference (train-set) features, protocol size, cached ----------
    data = ShapesDataset(image_size=(res, res))
    ref_cache = out / f"ref_feats_{feat}_{n_samples}.npy"
    t0 = time.time()
    if ref_cache.exists():
        ref_feats = np.load(ref_cache)
    else:
        def ref_stream():
            for i in range(n_samples):
                yield ((data[i]["image"] + 1) * 127.5).clip(0, 255).astype(
                    np.uint8
                )

        ref_feats = extract_features(ref_stream(), inc, (feat,), bs)[feat]
        np.save(ref_cache, ref_feats)
    t_ref = time.time() - t0

    # ---- 50k-sample generation + features, streamed ---------------------
    n_batches = (n_samples + bs - 1) // bs
    feats, logits = [], []
    t_sample = t_feat = 0.0
    for i in range(n_batches):
        t0 = time.time()
        imgs = sampler(state.ema_params, jax.random.PRNGKey(10_000 + i))
        imgs = np.asarray(imgs)  # device fence (axon: block_until_ready lies)
        t_sample += time.time() - t0
        t0 = time.time()
        u8 = (imgs * 255).clip(0, 255).astype(np.uint8)
        f = extract_features(u8, inc, taps, bs)
        feats.append(f[feat])
        logits.append(f["logits_unbiased"])
        t_feat += time.time() - t0
        if i % 20 == 0:
            print(f"[eval_fid] batch {i}/{n_batches} "
                  f"sample {bs * (i + 1) / max(t_sample, 1e-9):.1f} img/s",
                  flush=True)
    gen_feats = np.concatenate(feats)[:n_samples]
    gen_logits = np.concatenate(logits)[:n_samples]

    fid = float(compute_fid(jnp.asarray(gen_feats), jnp.asarray(ref_feats)))
    t0 = time.time()
    isc_m, isc_s = inception_score(jnp.asarray(gen_logits))
    kid_m, kid_s = kernel_inception_distance(
        jnp.asarray(gen_feats), jnp.asarray(ref_feats), jax.random.PRNGKey(0)
    )
    t_metrics = time.time() - t0
    tag = "proxy_" if weights == "random" else ""
    result = {
        "milestone": milestone,
        "step": None,
        "n_samples": n_samples,
        "weights": weights,
        f"{tag}fid": round(fid, 4),
        f"{tag}isc_mean": round(float(isc_m), 4),
        f"{tag}isc_std": round(float(isc_s), 4),
        f"{tag}kid_mean": round(float(kid_m), 6),
        f"{tag}kid_std": round(float(kid_s), 6),
        "sample_imgs_per_sec": round(n_batches * bs / t_sample, 1),
        "feature_imgs_per_sec": round(n_batches * bs / t_feat, 1),
        "ref_feature_secs": round(t_ref, 1),
        "isc_kid_secs": round(t_metrics, 1),
        "wall_secs": round(t_sample + t_feat + t_ref + t_metrics, 1),
    }
    try:
        result["step"] = int(state.step)
    except Exception:
        pass
    (out / "fid_eval.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
