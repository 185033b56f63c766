"""DIV2K-SR and LAION-t2i on-chip training-step probes (BASELINE rows).

Fills the last two empty family rows in BASELINE.md's measured table with
real v5e numbers at the REFERENCE config shapes:

  sr : div2k_cond_ddm_const_ldm.yaml — 512x512 4x-SR latent DDM, swin-
       conditioned cond_unet over 128x128x3 latents, batch 8.
  t2i: text2img/ddm_const_text.yaml — 256x256 t2i latent DDM (f8 VAE,
       32x32x4 latents), CondAttention over 77 synthetic token ids, batch 32
       + 10-step sampling at the config's sampler batch 16.

Random-init weights and synthetic batches (no DIV2K/LAION data mounted):
shapes/HBM-fit/compile/throughput are the object. Auto-falls-back to half
batch on RESOURCE_EXHAUSTED and records which fit.

Writes results/fam_onchip/results.json progressively.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path("results/fam_onchip")
STEPS = 20


def _put(results, key, value):
    results[key] = value
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(f"[fam_onchip] {key} = {value}", flush=True)


def probe(results, name, cfg_path, make_batch, sample_bs=None):
    import jax
    import jax.numpy as jnp

    from adm_tpu.cli._common import load_first_stage
    from adm_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step
    from adm_tpu.utils.config import build_model, load_conf

    cfg = load_conf(cfg_path)
    cfg["model"].setdefault("first_stage", {})
    if cfg["model"]["first_stage"]:
        cfg["model"]["first_stage"]["ckpt_path"] = None
    fs, fs_params = load_first_stage(cfg)
    model = build_model(cfg["model"], first_stage=fs)
    mesh = make_mesh()
    rep, dat = replicated_sharding(mesh), data_sharding(mesh)

    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = jax.device_put(
        TrainState.create(params, optimizer.init(params)), rep
    )
    _put(results, f"{name}_init_s", round(time.time() - t0, 1))
    step_fn = jax.jit(
        make_train_step(model, optimizer, EmaConfig(), grad_accum=1,
                        with_fs=True),
        in_shardings=(rep, dat, rep, rep), out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    fs_params_dev = jax.device_put(fs_params, rep)
    key = jax.random.PRNGKey(1)

    bs = int(cfg["data"]["batch_size"])
    while bs >= 1:
        try:
            batch = shard_batch(mesh, make_batch(bs))
            t0 = time.time()
            state, m = step_fn(state, batch, key, fs_params_dev)
            _ = float(m["loss"])
            compile_s = time.time() - t0
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback, recorded
            msg = str(e)
            _put(results, f"{name}_batch{bs}_error", msg[:300])
            if "RESOURCE_EXHAUSTED" not in msg and "memory" not in msg.lower():
                raise
            bs //= 2
    else:
        return
    t0 = time.time()
    for _i in range(STEPS):
        state, m = step_fn(state, batch, key, fs_params_dev)
    _ = float(m["loss"])
    dt = time.time() - t0
    _put(results, f"{name}_train", {
        "batch": bs, "compile_plus_first_s": round(compile_s, 1),
        "ms_per_step": round(dt / STEPS * 1e3, 1),
        "imgs_per_sec": round(bs * STEPS / dt, 1),
    })

    if sample_bs:
        cond = jnp.asarray(make_batch(sample_bs)["cond"])
        sampler = jax.jit(
            lambda p, fsp, k, c: model.sample(
                p, k, cond=c, fs_params=fsp, unnormalize=True
            )
        )
        t0 = time.time()
        _ = np.asarray(sampler(state.ema_params, fs_params_dev, key, cond))
        _put(results, f"{name}_sample_compile_s", round(time.time() - t0, 1))
        t0 = time.time()
        reps = 3
        for i in range(reps):
            _ = np.asarray(
                sampler(state.ema_params, fs_params_dev,
                        jax.random.PRNGKey(i), cond)
            )
        dt = time.time() - t0
        _put(results, f"{name}_sample", {
            "batch": sample_bs, "steps": 10,
            "imgs_per_sec": round(reps * sample_bs / dt, 1),
        })
    del state, step_fn
    import gc

    gc.collect()


def main():
    import logging

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    OUT.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rf = OUT / "results.json"
    results = json.loads(rf.read_text()) if rf.exists() else {}
    skip = set(os.environ.get("FAM_SKIP", "").split(","))

    rng = np.random.RandomState(0)

    if "sr" not in skip:
        def sr_batch(bs):
            img = rng.uniform(-1, 1, (bs, 512, 512, 3)).astype(np.float32)
            return {"image": img, "cond": img.copy()}  # bicubic-up LR stand-in

        probe(results, "sr",
              "adm_tpu/configs/super-resolution/div2k_cond_ddm_const_ldm.yaml",
              sr_batch)

    if "t2i" not in skip:
        def t2i_batch(bs):
            return {
                "image": rng.uniform(-1, 1, (bs, 256, 256, 3)).astype(
                    np.float32
                ),
                "cond": rng.randint(0, 49408, (bs, 77)).astype(np.int32),
            }

        probe(results, "t2i",
              "adm_tpu/configs/text2img/ddm_const_text.yaml",
              t2i_batch, sample_bs=16)


if __name__ == "__main__":
    main()
