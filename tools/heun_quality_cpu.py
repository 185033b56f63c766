"""2nd-order (Heun) sampling: quality vs compute on a TRAINED tiny model.

Companion study to tools/reuse_quality_cpu.py (shares its trained tiny
flagship + calibrated proxy-FID scorer): samples the EMA from IDENTICAL
init noise with the reference Euler sampler and the order=2 Heun sampler
(adm_tpu/core/sampling.py) at several step counts, and scores each on the
anchor scale. NFE accounting uses what the uniform scan actually
COMPUTES: euler-n = n evals, heun-n = 2n evals (the final correction is
computed-and-discarded), so

  heun5  (10 computed NFE) vs euler10 (10 NFE)  — matched compute vs the
                                                  reference protocol
  heun10 (20 computed NFE) vs euler20 (20 NFE)  — matched compute, denser
  euler25                                        — the steps-probe upper
                                                   reference point

The on-chip counterpart at a real milestone is tools/sample_steps_probe.py
(Euler-only); this study answers "should the extra NFE go to more Euler
steps or to 2nd order?" host-side, where chip time is free.

Usage: python tools/heun_quality_cpu.py [steps=1000]
Writes results/twin/heun_quality.json + grids.
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

import jax
import numpy as np

import reuse_quality_cpu as rq
from reuse_quality_cpu import (
    build_and_train,
    make_scorer,
    shared_init_noise,
    to_u8,
)

VARIANTS = (
    ("euler10", 1, 10),
    ("heun5", 2, 5),
    ("euler20", 1, 20),
    ("heun10", 2, 10),
    ("euler25", 1, 25),
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = Path("results/twin")
    out.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.image import save_image_grid

    model, state, data, train_wall = build_and_train(steps)
    score, anchors = make_scorer(data)
    report = {
        "config": dict(steps=steps, batch=rq.BATCH, res=rq.tw.RES,
                       feature=anchors["feature"]),
        "train_wall_s": train_wall,
        "anchor_heldout": anchors["anchor_heldout"],
        "anchor_noise": anchors["anchor_noise"],
        "variants": {},
    }
    init_noise = shared_init_noise()
    for name, order, n in VARIANTS:
        m = dataclasses.replace(model, sampling_timesteps=n)
        t1 = time.time()
        img = np.asarray(m.sample(
            state.ema_params, jax.random.PRNGKey(0),
            batch_size=init_noise.shape[0],
            unnormalize=True, init_noise=init_noise, order=order,
        ))
        report["variants"][name] = {
            "computed_nfe": order * n,
            "proxy_fid": round(score(to_u8(img)), 4),
            "cpu_wall_s": round(time.time() - t1, 1),
        }
        save_image_grid(np.clip(img[:16], 0, 1),
                        str(out / f"heunq-{name}.png"), nrow=4)
        print(f"[heunq] {name}: {report['variants'][name]}", flush=True)
        (out / "heun_quality.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
