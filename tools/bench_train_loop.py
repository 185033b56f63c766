"""Sustained TRAINER-LOOP throughput (not raw-step): flagship cifar config
through Trainer.train for N steps on the ShapesDataset, no milestones.

Measures what bench.py's raw-step timing cannot: the host loop's dispatch
pipelining (data feed, shard_batch, async step chaining). The round-2
host-side step-mirror fix removed a blocking device read per iteration;
this harness quantifies the sustained-loop gain on the tunneled backend.

Run:  python tools/bench_train_loop.py [steps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.data import ShapesDataset, batch_iterator
    from adm_tpu.data.loader import prefetch_iterator
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer

    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    it = prefetch_iterator(
        batch_iterator(ShapesDataset(image_size=(res, res)), 128, seed=0)
    )
    trainer = Trainer(
        model, it,
        train_num_steps=steps,
        train_lr=1e-4,
        warmup_steps=100,
        save_and_sample_every=0,   # no milestones: pure loop
        log_freq=10**9,            # no per-step host reads from logging
        results_folder="/tmp/bench_train_loop",
        ema_cfg=EmaConfig(update_after_step=50, update_every=8),
        csv_log=False,
        tensorboard=False,
    )
    # warmup: compile + first dispatches
    trainer.train(num_steps=20)
    jax.block_until_ready(trainer.state.params)
    t0 = time.time()
    trainer.train(num_steps=steps)
    # fence through a scalar host transfer (block_until_ready lies on axon)
    import jax.numpy as jnp

    float(jnp.sum(jax.tree_util.tree_leaves(trainer.state.params)[0]))
    dt = time.time() - t0
    done = steps - 20
    print(json.dumps({
        "steps": done,
        "wall_s": round(dt, 1),
        "imgs_per_sec_sustained": round(done * 128 / dt, 1),
    }))


if __name__ == "__main__":
    main()
