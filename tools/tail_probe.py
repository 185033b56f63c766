"""PERF_r3 experiment: non-matmul tail line items of the flagship step.

VERDICT r2 weak #1: the residual gap between the 413 img/s step and the
roofline was attributed to the non-matmul tail (GN stats, optimizer, EMA,
dropout RNG) without per-item measurements. This probe times three nested
programs on the real chip:

  full   — the production train step (fwd+bwd+clip+adamw+EMA)
  grad   — loss + gradient only (no optimizer, no EMA, no clip)
  fwd    — loss only

full-grad = optimizer+EMA+clip cost; grad-fwd = backward cost.
Appends rows to PERF_r3.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import os

TINY = bool(os.environ.get("ADM_TPU_PROBE_TINY"))  # CPU sanity mode
BATCH = 8 if TINY else 128
STEPS = 2 if TINY else 20


def main():
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    net, res = _flagship(tiny=TINY)
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    rep, dat = replicated_sharding(mesh), data_sharding(mesh)
    params = jax.device_put(params, rep)
    batch = shard_batch(
        mesh, {"image": jnp.zeros((BATCH, res, res, 3), jnp.float32)}
    )
    key = jax.random.PRNGKey(1)
    rows = []

    def put(row):
        rows.append(row)
        out = ("/tmp/tail_probe_tiny.jsonl" if TINY else
               Path(__file__).resolve().parents[1] / "PERF_r3.jsonl")
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    def timed(name, fn, *args):
        def fence(o):
            return float(jax.tree_util.tree_leaves(o)[0].ravel()[0])

        fence(fn(*args))  # compile + warm
        # fence EVERY iteration: unlike the state-threaded full step, these
        # calls are independent — unfenced they all dispatch at once and
        # 20 in-flight 860MB grad trees OOM the chip. The ~2 ms dispatch
        # floor of the tunnel is <2% of these step times.
        t0 = time.perf_counter()
        for _i in range(STEPS):
            fence(fn(*args))
        put({"experiment": "tail", "variant": name,
             "ms_per_step": round((time.perf_counter() - t0) / STEPS * 1e3, 1)})

    # fwd/grad variants FIRST — the full step below donates the state,
    # invalidating state.params
    def loss_fn(p, b, k):
        loss, _aux = model.training_step(p, b, k, train=True)
        return loss

    fwd_fn = jax.jit(
        lambda p, b, k: loss_fn(p, b, k),
        in_shardings=(rep, dat, rep), out_shardings=rep,
    )
    timed("fwd", fwd_fn, params, batch, key)

    grad_fn = jax.jit(
        lambda p, b, k: jax.grad(loss_fn)(p, b, k),
        in_shardings=(rep, dat, rep), out_shardings=rep,
    )
    timed("grad", grad_fn, params, batch, key)

    # full production step (state threads -> sequential chain); the
    # 4-copy fp32 TrainState is built only now, after the params-only probes
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = jax.device_put(
        TrainState.create(params, optimizer.init(params)), rep
    )
    step_fn = jax.jit(
        make_train_step(model, optimizer, EmaConfig(), grad_accum=1),
        in_shardings=(rep, dat, rep), out_shardings=(rep, rep),
        donate_argnums=(0,),  # without donation the step double-buffers the
        # 4-copy fp32 state and OOMs the 15.75G chip
    )
    st, m = step_fn(state, batch, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _i in range(STEPS):
        st, m = step_fn(st, batch, key)
    _ = float(m["loss"])
    put({"experiment": "tail", "variant": "full",
         "ms_per_step": round((time.perf_counter() - t0) / STEPS * 1e3, 1)})

    fwd = rows[0]["ms_per_step"]
    grad = rows[1]["ms_per_step"]
    full = rows[2]["ms_per_step"]
    put({"experiment": "tail_verdict",
         "fwd_ms": fwd, "bwd_ms": round(grad - fwd, 1),
         "opt_ema_clip_ms": round(full - grad, 1),
         "full_ms": full})


if __name__ == "__main__":
    main()
