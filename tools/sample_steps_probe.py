"""Is the long-run sample noise a 10-step discretization artifact?

The 52k-step flagship milestone still shows noise-dominated grids and the
proxy-FID trend has plateaued ~0.13-0.14 on the [heldout ~0, noise 0.835]
anchor scale (results/long_run/anchors.json). Twin-training parity
(tools/twin_train.py) says the TRAINING loop matches the reference, so the
remaining suspects are recipe-scale (52k of 800k reference steps) and the
10-step sampler discretization (reference default, cifar yaml:7).

This probe samples the SAME milestone with 10 / 25 / 50 deterministic steps
and with the stochastic sampler, scoring each against the cached reference
features — if more steps collapse the proxy-FID, the trend plateau is a
sampler-resolution floor, not a training problem.

Usage: python tools/sample_steps_probe.py [milestone=newest] [n=1024]
Writes results/long_run/sample_steps_probe.json + grids.
"""

from __future__ import annotations

import dataclasses
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
    net, res = _flagship()
    base = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    state = restore_train_state(
        base, str(out / f"model-{milestone}"), required=True
    )
    inc = load_inception_params("random")
    feat = fid_feature_key("random")
    ref = np.load(out / "ref_feats_192_2048.npy")

    results = {"milestone": milestone, "n": n}
    # resume: keep variants already scored for the SAME milestone/n
    probe_json = out / "sample_steps_probe.json"
    if probe_json.exists():
        prev = json.loads(probe_json.read_text())
        if prev.get("milestone") == milestone and prev.get("n") == n:
            results.update(prev)
    # heun5 computes exactly det10's 10 NFE (2 evals/step, the final
    # correction is computed-and-discarded); heun10 computes 20, between
    # det10 and det25 — "should extra NFE buy more Euler steps or 2nd
    # order?" on the real milestone (CPU counterpart: heun_quality_cpu.py)
    variants = [
        ("det10", dict(sampling_timesteps=10), {}),
        ("det25", dict(sampling_timesteps=25), {}),
        ("det50", dict(sampling_timesteps=50), {}),
        ("stoch10", dict(sampling_timesteps=10, sample_type="stochastic"), {}),
        ("heun5", dict(sampling_timesteps=5), dict(order=2)),
        ("heun10", dict(sampling_timesteps=10), dict(order=2)),
    ]
    for name, kw, sample_kw in variants:
        if name in results:
            print(f"[steps_probe] {name}: cached "
                  f"proxy_fid={results[name]['proxy_fid']}", flush=True)
            continue
        model = dataclasses.replace(base, **kw)
        sampler = jax.jit(
            lambda p, k, m=model, skw=sample_kw: m.sample(
                p, k, batch_size=bs, unnormalize=True, **skw
            )
        )
        t0 = time.time()
        frames = []
        for i in range(n // bs):
            imgs = np.asarray(
                sampler(state.ema_params, jax.random.PRNGKey(500 + i))
            )
            frames.append((imgs * 255).clip(0, 255).astype(np.uint8))
        u8 = np.concatenate(frames)
        f = extract_features(u8, inc, (feat,), bs)[feat]
        fid = float(compute_fid(jnp.asarray(f), jnp.asarray(ref)))
        save_image_grid(
            frames[0][:16].astype(np.float32) / 255.0,
            str(out / f"probe_{name}.png"), nrow=4,
        )
        results[name] = {
            "proxy_fid": round(fid, 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[steps_probe] {name}: proxy_fid={fid:.4f}", flush=True)
        (out / "sample_steps_probe.json").write_text(
            json.dumps(results, indent=1)
        )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
