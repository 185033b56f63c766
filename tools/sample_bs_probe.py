"""PERF_r3 experiment: 10-step sampling throughput vs batch size.

Sampling is forward-only (no autodiff residuals), so HBM headroom allows
much larger batches than training's 128 — and the 10-step sampler
(reference protocol, ddm_const_2.py:92 `sampling_timesteps: 10`) is the
second north-star axis. This sweeps the jitted EMA sampler over batch
sizes and records fenced img/s, to pick the serving/eval batch.

Appends rows to PERF_r3.jsonl. Usage: python tools/sample_bs_probe.py
(ADM_TPU_PROBE_TINY=1 for a CPU smoke pass).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TINY = bool(os.environ.get("ADM_TPU_PROBE_TINY"))
BATCHES = (8, 16) if TINY else (128, 256, 512, 1024)
REPS = 1 if TINY else 3


def main():
    import jax

    if TINY:
        # JAX_PLATFORMS is ignored by the axon plugin (CLAUDE.md): the
        # config update is the only way to keep the smoke pass off-chip
        jax.config.update("jax_platforms", "cpu")
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM

    net, res = _flagship(tiny=TINY)
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    out = (Path("/tmp/perf_tiny.jsonl") if TINY
           else Path(__file__).resolve().parents[1] / "PERF_r4.jsonl")
    rows = []
    for bs in BATCHES:
        sample = jax.jit(
            lambda p, k, bs=bs: model.sample(p, k, batch_size=bs,
                                             unnormalize=True)
        )
        try:
            t0 = time.perf_counter()
            # fence: block_until_ready is unreliable on axon (CLAUDE.md)
            _ = float(jnp.sum(sample(params, jax.random.PRNGKey(0))))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(REPS):
                _ = float(jnp.sum(sample(params, jax.random.PRNGKey(1 + i))))
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at some batch: record and stop
            row = {"experiment": "sample_bs", "batch": bs,
                   "error": type(e).__name__}
            print(json.dumps(row), flush=True)
            with out.open("a") as f:
                f.write(json.dumps(row) + "\n")
            break
        row = {"experiment": "sample_bs", "batch": bs,
               "imgs_per_sec": round(bs * REPS / dt, 1),
               "ms_per_image": round(dt / (bs * REPS) * 1e3, 3),
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with out.open("a") as f:
            f.write(json.dumps(row) + "\n")
    if rows:
        best = max(rows, key=lambda r: r["imgs_per_sec"])
        verdict = {"experiment": "sample_bs_verdict", "best_batch": best["batch"],
                   "best_imgs_per_sec": best["imgs_per_sec"],
                   "vs_b128": round(best["imgs_per_sec"] /
                                    rows[0]["imgs_per_sec"], 3)}
        print(json.dumps(verdict), flush=True)
        with out.open("a") as f:
            f.write(json.dumps(verdict) + "\n")


if __name__ == "__main__":
    main()
