"""CelebA-HQ-256 family on-chip exercise (first TPU run beyond cifar10).

Three phases on the real v5e chip, filling BASELINE.md's empty celebahq row
(reference protocol: train_vae.py:232-323 -> train_uncond_ldm.py):

  1. KL-f4 VAE GAN training at 256x256 (celeb_ae_kl_256x256_d4.yaml shapes,
     both generator and discriminator phases exercised — disc_start lowered
     so the hinge-D phase actually runs inside the probe window).
  2. Latent DDM training over the saved first stage
     (celeb_uncond_ddm_const_uncond_unet_ldm.yaml shapes: DhariwalUNet 96ch
     on 64x64x3 latents, batch 48).
  3. 10-step EMA sampling (latent sample + VAE decode), batch 64.

No real CelebA-HQ data is mounted in this environment (no egress); the
procedural ShapesDataset provides 256x256 batches so shapes/HBM/compile/
throughput — the object of the exercise — are the real ones.

Writes results/celeb_onchip/results.json progressively (safe to rerun; each
phase can be skipped via CELEB_SKIP=vae,ldm,sample).

Usage: python tools/celeb_onchip.py   (background; ~1-2h of tunnel compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

VAE_STEPS = int(os.environ.get("CELEB_VAE_STEPS", "260"))
LDM_STEPS = int(os.environ.get("CELEB_LDM_STEPS", "260"))
WARM_STEPS = 20  # compile + warmup segment excluded from steady timing

OUT = Path("results/celeb_onchip")
VAE_CFG = "adm_tpu/configs/celebahq/celeb_ae_kl_256x256_d4.yaml"
LDM_CFG = "adm_tpu/configs/celebahq/celeb_uncond_ddm_const_uncond_unet_ldm.yaml"


def _put(results: dict, key: str, value):
    results[key] = value
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(f"[celeb_onchip] {key} = {value}", flush=True)


def _fence(x) -> float:
    # block_until_ready is unreliable on the axon backend (CLAUDE.md):
    # fence with a scalar host transfer
    import jax.numpy as jnp

    leaves = [l for l in __import__("jax").tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def phase_vae(results: dict):
    import jax

    from adm_tpu.cli.train_vae import build_vae
    from adm_tpu.data import ShapesDataset
    from adm_tpu.data.loader import batch_iterator
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.utils.config import load_conf
    from adm_tpu.vae.losses import VAELossConfig
    from adm_tpu.vae.trainer import VAETrainer

    cfg = load_conf(VAE_CFG)
    mcfg, dcfg = cfg["model"], cfg["data"]
    lc = mcfg["lossconfig"]
    bs = int(dcfg["batch_size"])  # 8, per reference config
    module = build_vae(mcfg)
    it = batch_iterator(
        ShapesDataset(image_size=(256, 256)), batch_size=bs, seed=0
    )
    t_init = time.time()
    trainer = VAETrainer(
        module,
        it,
        image_size=(256, 256),
        in_channels=3,
        loss_cfg=VAELossConfig(
            # disc_start 20001 in the config — lowered so the probe window
            # exercises the discriminator phase too
            disc_start=WARM_STEPS + 20,
            kl_weight=float(lc["kl_weight"]),
            disc_weight=float(lc["disc_weight"]),
            disc_in_channels=3,
        ),
        train_num_steps=VAE_STEPS,
        train_lr=float(cfg["trainer"]["lr"]),
        min_lr=float(cfg["trainer"].get("min_lr", 1e-6)),
        warmup_steps=20,
        log_freq=20,
        save_and_sample_every=10 * VAE_STEPS,  # save manually below
        results_folder=str(OUT / "vae"),
        ema_cfg=EmaConfig(update_after_step=0, update_every=1),
    )
    _put(results, "vae_init_s", round(time.time() - t_init, 1))

    t0 = time.time()
    trainer.train(num_steps=WARM_STEPS)
    _fence(trainer.state.ae_params)
    _put(results, "vae_compile_plus_warm_s", round(time.time() - t0, 1))

    t0 = time.time()
    trainer.train(num_steps=VAE_STEPS)
    _fence(trainer.state.ae_params)
    dt = time.time() - t0
    n = VAE_STEPS - WARM_STEPS
    _put(results, "vae_steady", {
        "steps": n, "batch": bs, "s_per_step": round(dt / n, 4),
        "imgs_per_sec": round(n * bs / dt, 1),
    })
    trainer.save(1)
    _put(results, "vae_milestone", str(OUT / "vae" / "model-1"))
    # recon grid: eyeball artifact that encode/decode runs on-chip
    import jax.numpy as jnp

    from adm_tpu.utils.image import save_image_grid

    batch = next(it)
    x = jnp.asarray(batch["image"][:8])
    rec = trainer._recon(trainer.state.ae_params, x, jax.random.PRNGKey(0))
    pair = np.concatenate(
        [np.asarray((x + 1) / 2), np.clip(np.asarray((rec + 1) / 2), 0, 1)]
    )
    save_image_grid(pair, str(OUT / "vae_recon.png"), nrow=8)
    del trainer
    import gc

    gc.collect()


def phase_ldm(results: dict):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from adm_tpu.cli._common import load_first_stage
    from adm_tpu.data import ShapesDataset
    from adm_tpu.data.loader import batch_iterator, prefetch_iterator
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer
    from adm_tpu.utils.config import build_model, load_conf

    cfg = load_conf(LDM_CFG)
    mcfg, dcfg, tcfg = cfg["model"], cfg["data"], cfg["trainer"]
    mcfg["first_stage"]["ckpt_path"] = str(
        (OUT / "vae" / "model-1").absolute()
    )
    # batch 48 at 256x256 needs 17.6G > 15.75G HBM without rematerialization
    # (measured OOM); per-block remat is the designed fit knob (nn/unets.py)
    mcfg["unet"]["remat"] = True
    fs, fs_params = load_first_stage(cfg)
    model = build_model(mcfg, first_stage=fs)
    bs = int(dcfg["batch_size"])  # 48, per reference config
    it = prefetch_iterator(batch_iterator(
        ShapesDataset(image_size=(256, 256)), batch_size=bs, seed=1
    ))
    first_batch = next(it)
    # config sets default_scale: True -> keep scale_factor 0.165, but
    # exercise the on-chip calibration path once anyway (it is one encode)
    t0 = time.time()
    sf = model.calibrate_scale_factor(
        fs_params, jnp.asarray(first_batch["image"]), jax.random.PRNGKey(0)
    )
    _put(results, "ldm_calibrate", {
        "s": round(time.time() - t0, 1), "scale_factor": round(float(sf), 5),
    })
    t_init = time.time()
    trainer = Trainer(
        model,
        it,
        train_num_steps=LDM_STEPS,
        train_lr=float(tcfg["lr"]),
        min_lr=float(tcfg.get("min_lr", 5e-6)),
        warmup_steps=20,
        weight_decay=1e-2,
        gradient_accumulate_every=int(tcfg.get("gradient_accumulate_every", 1)),
        save_and_sample_every=0,
        log_freq=20,
        results_folder=str(OUT / "ldm"),
        ema_cfg=EmaConfig(update_after_step=0, update_every=8),
        fs_params=fs_params,
        sample_batch_size=16,
    )
    _put(results, "ldm_init_s", round(time.time() - t_init, 1))

    t0 = time.time()
    trainer.train(num_steps=WARM_STEPS)
    _fence(trainer.state.params)
    _put(results, "ldm_compile_plus_warm_s", round(time.time() - t0, 1))

    t0 = time.time()
    trainer.train(num_steps=LDM_STEPS)
    _fence(trainer.state.params)
    dt = time.time() - t0
    n = LDM_STEPS - WARM_STEPS
    _put(results, "ldm_steady", {
        "steps": n, "batch": bs, "s_per_step": round(dt / n, 4),
        "imgs_per_sec": round(n * bs / dt, 1),
        "trainer_stats": getattr(trainer, "last_run_stats", None),
    })
    trainer.save(1)
    _put(results, "ldm_milestone", str(OUT / "ldm" / "model-1"))
    return model, fs_params, trainer.state


def phase_sample(results: dict, model, fs_params, state):
    import jax

    from adm_tpu.utils.image import save_image_grid

    bs = 64  # reference sampler batch (celeb config sampler.batch_size)
    sampler = jax.jit(
        lambda p, fsp, k: model.sample(
            p, k, batch_size=bs, fs_params=fsp, unnormalize=True
        )
    )
    t0 = time.time()
    imgs = np.asarray(
        sampler(state.ema_params, fs_params, jax.random.PRNGKey(0))
    )
    _put(results, "sample_compile_plus_first_s", round(time.time() - t0, 1))
    t0 = time.time()
    reps = 3
    for i in range(reps):
        imgs = np.asarray(
            sampler(state.ema_params, fs_params, jax.random.PRNGKey(i + 1))
        )
    dt = time.time() - t0
    _put(results, "sample_steady", {
        "batch": bs, "steps": 10, "s_per_batch": round(dt / reps, 3),
        "imgs_per_sec": round(reps * bs / dt, 1),
    })
    save_image_grid(
        np.clip(imgs[:16], 0, 1), str(OUT / "ldm_samples.png"), nrow=4
    )


def main():
    import logging

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "run.pid").write_text(str(os.getpid()))
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    skip = set(os.environ.get("CELEB_SKIP", "").split(","))
    rf = OUT / "results.json"
    results = json.loads(rf.read_text()) if rf.exists() else {}
    results["platform"] = jax.devices()[0].platform
    t_all = time.time()
    if "vae" not in skip:
        phase_vae(results)
    if "ldm" not in skip:
        model, fs_params, state = phase_ldm(results)
        if "sample" not in skip:
            phase_sample(results, model, fs_params, state)
    _put(results, "total_wall_s", round(time.time() - t_all, 1))


if __name__ == "__main__":
    main()
