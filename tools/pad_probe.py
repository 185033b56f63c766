"""PERF_r3 experiment: lane-aligned channel widths (channel_round=128).

BASELINE.md's microbench says C=192 convs run at 59% MFU while a 256-wide
(lane-aligned) output hits 79% — this probe settles whether rounding the
flagship's level widths up to 128 multiples (192 -> 256, 384 unchanged;
DhariwalUNet.channel_round) wins or loses END TO END, like the round-2
custom-conv campaign. The padded model has 1.33x the level-1 width, so the
verdict weighs MFU recovery against the extra FLOPs.

Appends one JSON row per config to PERF_r3.jsonl.

Usage: python tools/pad_probe.py   (TPU; two train-step compiles)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

BATCH = 128
STEPS = 20


def bench_one(channel_round: int) -> dict:
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    res = 32
    net = EDMPrecond(
        img_resolution=res,
        img_channels=3,
        sigma_data=1.0,
        variant="const",
        n_decoders=2,
        dtype=jnp.bfloat16,
        model_kwargs=dict(
            model_channels=192, channel_mult=(1, 2, 2, 2), num_blocks=3,
            attn_resolutions=(16, 8), dropout=0.1, augment_dim=9,
            channel_round=channel_round,
        ),
    )
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(params)
    )
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = TrainState.create(params, optimizer.init(params))
    step_fn = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)
    rep, dat = replicated_sharding(mesh), data_sharding(mesh)
    state = jax.device_put(state, rep)
    jitted = jax.jit(step_fn, in_shardings=(rep, dat, rep),
                     out_shardings=(rep, rep), donate_argnums=(0,))
    batch = shard_batch(
        mesh, {"image": jnp.zeros((BATCH, res, res, 3), jnp.float32)}
    )
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = jitted(state, batch, key)
    _ = float(m["loss"])  # host-transfer fence (axon block_until_ready lies)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = jitted(state, batch, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    row = {
        "experiment": "channel_round",
        "channel_round": channel_round,
        "params": n_params,
        "ms_per_step": round(dt / STEPS * 1e3, 1),
        "imgs_per_sec": round(BATCH * STEPS / dt, 1),
        "compile_s": round(compile_s, 1),
    }
    with open(Path(__file__).resolve().parents[1] / "PERF_r3.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return row


def main():
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    base = bench_one(0)
    padded = bench_one(128)
    verdict = {
        "experiment": "channel_round_verdict",
        "speedup_e2e": round(base["ms_per_step"] / padded["ms_per_step"], 3),
        "param_ratio": round(padded["params"] / base["params"], 3),
    }
    with open(Path(__file__).resolve().parents[1] / "PERF_r3.jsonl", "a") as f:
        f.write(json.dumps(verdict) + "\n")
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
