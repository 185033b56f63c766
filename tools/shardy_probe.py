"""A/B the Shardy vs GSPMD partitioner on the FSDP dryrun phase
(VERDICT r4 weak #4 / next #7).

The fsdp phase of dryrun_multichip carries ~26 '[SPMD] Involuntary full
rematerialization' warnings on the bwd weight re-gather route; the
warning text itself recommends Shardy (XLA b/433785288). This probe runs
EXACTLY that phase (tiny flagship, 8-dev CPU mesh, fsdp_state_shardings
min_size=4096) under both partitioners in separate processes (the
partitioner choice is sticky per backend) and reports the warning count
and compile+step wall time for each.

Run: python tools/shardy_probe.py          # spawns both child probes
     python tools/shardy_probe.py child 0|1   # one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def child(use_shardy: bool) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_use_shardy_partitioner", use_shardy)
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _capture_fd2
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.parallel.fsdp import fsdp_state_shardings
    from adm_tpu.parallel.mesh import (
        data_sharding, make_mesh, replicated_sharding, shard_batch)
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    net, res = _flagship(tiny=True)
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=1000)
    step_fn = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)
    rep = replicated_sharding(mesh)
    dat = data_sharding(mesh)
    batch = shard_batch(mesh, {"image": jnp.zeros((16, res, res, 3),
                                                  jnp.float32)})
    state = TrainState.create(params, optimizer.init(params))
    fs_sh = fsdp_state_shardings(state, mesh, min_size=4096)
    state = jax.device_put(state, fs_sh)
    jitted = jax.jit(step_fn, in_shardings=(fs_sh, dat, rep),
                     out_shardings=(fs_sh, rep))
    cap: dict = {}
    t0 = time.perf_counter()
    with _capture_fd2(cap):
        state, m = jitted(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
    wall = time.perf_counter() - t0
    print(json.dumps({
        "partitioner": "shardy" if use_shardy else "gspmd",
        "spmd_remat_warnings": cap["spmd_warnings"],
        "compile_plus_step_secs": round(wall, 1),
        "loss_finite": bool(jnp.isfinite(m["loss"])),
    }), flush=True)


def main() -> int:
    results = []
    for flag in (0, 1):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "child", str(flag)],
                capture_output=True, text=True, timeout=1800, cwd=str(REPO))
        except subprocess.TimeoutExpired:
            results.append({"partitioner": ["gspmd", "shardy"][flag],
                            "error": "child timed out (1800s)"})
            continue
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
        else:
            results.append({"partitioner": ["gspmd", "shardy"][flag],
                            "error": out.stderr[-500:]})
    print(json.dumps(results, indent=1))
    (REPO / "results" / "shardy_probe.json").write_text(
        json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(bool(int(sys.argv[2])))
    else:
        sys.exit(main())
