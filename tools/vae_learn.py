"""VAE GAN learning-evidence run on the real chip (VERDICT r3 item 4a).

Round 3 measured the VAE trainer's THROUGHPUT on-chip (32.2 img/s, both
phases) at random weights; this run shows the trainer LEARNS: recon loss
falling, d_weight behaving, and input|recon grids visibly improving over a
few thousand steps on procedural 256x256 shapes (reference protocol:
train_vae.py:281-323 — recon grids + loss logging per interval).

Config: celeb_ae_kl_256x256_d4.yaml shapes (KL-f4, embed_dim 3, batch 8)
with disc_start lowered so the GAN phase is active inside the window.

Writes results/vae_learn/{learn.csv, recon-*.png, results.json}.
Usage: python tools/vae_learn.py [steps=2000]   (on the axon TPU)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path("results/vae_learn")
STEPS_DEFAULT = 2000
DISC_START = 600
LOG_EVERY = 100
GRID_AT = (200, 1000)  # plus the final step


def main():
    import os

    # env knobs let a CPU fallback run at reduced scale WITHOUT touching
    # the chip defaults (relay outages can block the chip for half a day;
    # learning evidence at 64x64 CPU beats none):
    #   ADM_TPU_VAE_LEARN_RES   image side (default 256)
    #   ADM_TPU_VAE_LEARN_BATCH batch (default 8)
    #   ADM_TPU_VAE_LEARN_OUT   results dir (default results/vae_learn)
    #   ADM_TPU_VAE_LEARN_DISC  disc_start (default 600)
    global OUT, DISC_START
    res = int(os.environ.get("ADM_TPU_VAE_LEARN_RES", "256"))
    batch = int(os.environ.get("ADM_TPU_VAE_LEARN_BATCH", "8"))
    OUT = Path(os.environ.get("ADM_TPU_VAE_LEARN_OUT", str(OUT)))
    DISC_START = int(os.environ.get("ADM_TPU_VAE_LEARN_DISC",
                                    str(DISC_START)))
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else STEPS_DEFAULT
    OUT.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import yaml

    from adm_tpu.cli.train_vae import build_vae
    from adm_tpu.data import ShapesDataset, batch_iterator
    from adm_tpu.utils.image import save_image_grid
    from adm_tpu.vae.losses import VAELossConfig
    from adm_tpu.vae.trainer import VAETrainer

    cfg = yaml.safe_load(open("adm_tpu/configs/celebahq/celeb_ae_kl_256x256_d4.yaml"))
    module = build_vae(cfg["model"])
    loss_cfg = VAELossConfig(
        disc_start=DISC_START,
        kl_weight=float(cfg["model"]["lossconfig"].get("kl_weight", 1e-6)),
        disc_weight=float(cfg["model"]["lossconfig"].get("disc_weight", 0.5)),
    )
    data = ShapesDataset(image_size=(res, res))
    it = batch_iterator(data, batch_size=batch, seed=0)

    trainer = VAETrainer(
        module, it,
        image_size=(res, res), in_channels=3, loss_cfg=loss_cfg,
        train_num_steps=steps, train_lr=1e-4, warmup_steps=200,
        log_freq=LOG_EVERY, save_and_sample_every=0,
        results_folder=str(OUT),
    )

    # fixed eval batch for the recon grids (held-out indices)
    eval_x = np.stack([data[100_000 - 1 - i]["image"] for i in range(4)])

    csv = OUT / "learn.csv"
    csv.write_text("step,rec_loss,kl_loss,d_weight,g_loss,disc_loss\n")
    rows = []

    def grid(step):
        import jax.numpy as jnp

        rec = np.asarray(trainer._recon(
            trainer.state.ae_params, jnp.asarray(eval_x), jax.random.PRNGKey(0)
        ))
        pair = np.concatenate([eval_x, rec], axis=0)  # top: input, bottom: recon
        save_image_grid(
            np.clip((pair + 1) / 2, 0, 1), str(OUT / f"recon-{step}.png"), nrow=4
        )
        print(f"[vae_learn] wrote recon-{step}.png", flush=True)

    t0 = time.time()
    # manual loop so we can CSV-log every LOG_EVERY steps with fenced reads
    from adm_tpu.parallel.mesh import shard_batch

    step = int(trainer.state.step)
    while step < steps:
        mb = shard_batch(trainer.mesh, next(trainer.data_iter))
        trainer.state, metrics = trainer._step(
            trainer.state, mb, trainer.train_key
        )
        step += 1
        if step % LOG_EVERY == 0 or step == steps:
            m = {k: float(v) for k, v in metrics.items()}
            row = (step, m.get("train/rec_loss", 0), m.get("train/kl_loss", 0),
                   m.get("train/d_weight", 0), m.get("train/g_loss", 0),
                   m.get("train/disc_loss", 0))
            rows.append(row)
            with open(csv, "a") as f:
                f.write(",".join(str(round(v, 6)) for v in row) + "\n")
            print(f"[vae_learn] step {step}/{steps} rec={row[1]:.4f} "
                  f"d_weight={row[3]:.4f} disc={row[5]:.4f} "
                  f"({batch * step / (time.time() - t0):.1f} img/s)", flush=True)
        if step in GRID_AT or step == steps:
            grid(step)

    first, last = rows[0], rows[-1]
    summary = {
        "steps": steps, "res": res, "batch": batch,
        "wall_seconds": round(time.time() - t0, 1),
        "imgs_per_sec": round(batch * steps / (time.time() - t0), 1),
        "rec_loss_first": first[1], "rec_loss_last": last[1],
        "rec_drop_ratio": round(last[1] / max(first[1], 1e-9), 4),
        "d_weight_last": last[3],
        "disc_active_from": DISC_START,
    }
    (OUT / "results.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
