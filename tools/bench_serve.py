"""Serving-path throughput on the real chip: AOT-compiled flagship sampler.

Measures img/s of the 10-step flagship sampler through the serve path
(aot_compile_sampler — the warm-started executable a server would run),
with the axon-safe fence (scalar host transfer; block_until_ready lies on
this backend, see CLAUDE.md).

Run:  python tools/bench_serve.py [batch] [iters] [steps] [order] [reuse]
(steps/order/reuse select the accelerated sampler variants — e.g.
`... 128 5 5 2 1` benches heun5, the matched-NFE quality winner in
BASELINE "Sampling acceleration" #3.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    order = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    reuse = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.serve import aot_compile_sampler

    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        sampling_timesteps=steps,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    t0 = time.time()
    compiled, flops = aot_compile_sampler(
        model, params, batch_size=batch, encoder_reuse=reuse, order=order,
    )
    t_compile = time.time() - t0

    noise = jax.random.normal(
        jax.random.PRNGKey(1), (batch, res, res, 3), jnp.float32
    )
    out = compiled(params, noise, jnp.uint32(0))
    float(jnp.sum(out))  # fence (warmup excluded from timing)

    t0 = time.time()
    for i in range(iters):
        out = compiled(params, noise, jnp.uint32(i))
        float(jnp.sum(out))
    dt = (time.time() - t0) / iters

    print(json.dumps({
        "batch": batch,
        "sampling_steps": steps,
        "order": order,
        "encoder_reuse": reuse,
        "compile_s": round(t_compile, 1),
        "ms_per_batch": round(dt * 1000, 1),
        "imgs_per_sec": round(batch / dt, 1),
        "flops_per_batch": flops,
    }))


if __name__ == "__main__":
    main()
