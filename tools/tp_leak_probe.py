"""A/B probe for the dp x tp affine resharding leak (VERDICT r2 weak #3).

Compiles the tiny-flagship train step on the virtual 8-device CPU mesh
under dp4 x tp2 and under fsdp8, capturing XLA's '[SPMD] Involuntary full
rematerialization' warnings per phase, for a chosen affine-kernel sharding
rule (ADM_TPU_TP_AFFINE = 'row' | 'rep').

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/tp_leak_probe.py [dp_tp|fsdp] 2> stderr.txt
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "dp_tp"
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

    net, res = _flagship(tiny=True)
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True)
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=100, warmup_steps=10)
    step_fn = make_train_step(
        model, optimizer, EmaConfig(update_after_step=0, update_every=1),
        grad_accum=2,
    )
    devices = jax.devices()[:8]

    if phase == "dp_tp":
        from adm_tpu.parallel.tp import tp_state_shardings

        mesh = make_mesh(n_data=4, n_model=2, devices=devices)
        state = TrainState.create(params, optimizer.init(params))
        st_sh = tp_state_shardings(state, mesh)
    else:
        from adm_tpu.parallel.fsdp import fsdp_state_shardings

        mesh = make_mesh(n_data=8, devices=devices)
        state = TrainState.create(params, optimizer.init(params))
        st_sh = fsdp_state_shardings(state, mesh, min_size=4096)

    state = jax.device_put(state, st_sh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(st_sh, data_sharding(mesh), replicated_sharding(mesh)),
        out_shardings=(st_sh, replicated_sharding(mesh)),
    )
    batch = shard_batch(mesh, {
        "image": jnp.zeros((16, res, res, 3), jnp.float32),
    })
    state, m = jitted(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    print(f"{phase} ok loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
