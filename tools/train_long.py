"""Long-run 'does it learn' harness (VERDICT round-1 item 10).

Trains the FULL cifar flagship (192ch two-decoder EDMPrecond, const
process, weighting_loss, dropout 0.1, EMA) for several thousand steps on
the procedural ShapesDataset (no real data is mounted in this environment;
shapes are a distribution whose learning is visible in samples), writing:

  results/long_run/training_log.csv     loss curve
  results/long_run/samples-*.png        milestone EMA sample grids
  results/long_run/summary.json         first/last loss, throughput

Run:  python tools/train_long.py [steps] [resume_milestone]
(resume_milestone N restores results/long_run/model-N and continues to
`steps` — exercises the production checkpoint-resume path on-chip)
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    resume = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.data import ShapesDataset, batch_iterator
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer
    from adm_tpu.utils.image import save_image_grid

    out = Path("results/long_run")
    out.mkdir(parents=True, exist_ok=True)

    net, res = _flagship()
    model = DDPM(
        net=net, process_name="const", image_size=(res, res), channels=3,
        weighting_loss=True, sampling_timesteps=10,
    )
    data = ShapesDataset(image_size=(res, res))
    it = batch_iterator(data, batch_size=128, seed=0)

    def sample_fn(trainer, milestone):
        imgs = np.asarray(
            trainer._sample(trainer.state.ema_params, jax.random.PRNGKey(42))
        )
        path = str(out / f"samples-{milestone}.png")
        save_image_grid(np.clip(imgs, 0, 1), path, nrow=4)
        print(f"[long_run] wrote {path}", flush=True)
        # retention: keep the 2 newest orbax milestones (3 GB each)
        import re
        import shutil

        dirs = sorted(
            (d for d in out.iterdir()
             if d.is_dir() and re.fullmatch(r"model-\d+", d.name)),
            key=lambda d: int(d.name.split("-")[1]),
        )
        for d in dirs[:-2]:
            shutil.rmtree(d, ignore_errors=True)

    trainer = Trainer(
        model,
        it,
        train_num_steps=steps,
        train_lr=1e-4,
        warmup_steps=500,
        gradient_accumulate_every=1,
        save_and_sample_every=2000,
        log_freq=200,
        results_folder=str(out),
        ema_cfg=EmaConfig(update_after_step=1000, update_every=8),
        sample_batch_size=16,
        resume_milestone=resume,
    )
    t0 = time.time()
    if not resume:
        sample_fn(trainer, 0)  # pre-training grid: pure noise baseline
    trainer.train(sample_fn=sample_fn)
    dt = time.time() - t0

    rows = [
        line.split(",")
        for line in (out / "training_log.csv").read_text().strip().splitlines()[1:]
    ]
    losses = [float(r[1]) for r in rows]
    run_steps = steps - resume * 2000  # milestones land every 2000 steps
    summary = {
        "steps": steps,
        "resumed_from_step": resume * 2000,
        "wall_seconds": round(dt, 1),
        "imgs_per_sec": round(run_steps * 128 / dt, 1),
        "first_logged_loss": losses[0],
        "last_logged_loss": losses[-1],
        "min_loss": min(losses),
        "loss_drop_ratio": round(losses[-1] / max(losses[0], 1e-9), 4),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
