"""PERF_r3: batch 256 + per-block remat throughput row.

b256 without remat OOMs (fp32 GN copies fixed in round 2, still >15.75G);
remat trades ~1/3 recompute for activation memory. If the step is truly
HBM-bandwidth-bound, the bigger batch shouldn't help imgs/s — this row
pins that prediction (and gives large-batch users the measured trade).
"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

def main():
    from adm_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.parallel.mesh import (data_sharding, make_mesh,
                                       replicated_sharding, shard_batch)
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step
    BATCH, STEPS, res = 256, 20, 32
    net = EDMPrecond(
        img_resolution=res, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2, dtype=jnp.bfloat16,
        model_kwargs=dict(model_channels=192, channel_mult=(1, 2, 2, 2),
                          num_blocks=3, attn_resolutions=(16, 8),
                          dropout=0.1, augment_dim=9, remat=True),
    )
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = jax.device_put(TrainState.create(params, optimizer.init(params)),
                           replicated_sharding(mesh))
    step_fn = jax.jit(
        make_train_step(model, optimizer, EmaConfig(), grad_accum=1),
        in_shardings=(replicated_sharding(mesh), data_sharding(mesh),
                      replicated_sharding(mesh)),
        out_shardings=(replicated_sharding(mesh), replicated_sharding(mesh)),
        donate_argnums=(0,),
    )
    batch = shard_batch(mesh, {"image": jnp.zeros((BATCH, res, res, 3),
                                                  jnp.float32)})
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step_fn(state, batch, key)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(STEPS):
        state, m = step_fn(state, batch, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    row = {"experiment": "b256_remat", "batch": BATCH,
           "ms_per_step": round(dt / STEPS * 1e3, 1),
           "imgs_per_sec": round(BATCH * STEPS / dt, 1),
           "compile_s": round(compile_s, 1)}
    with open(Path(__file__).resolve().parents[1] / "PERF_r3.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)

if __name__ == "__main__":
    main()
