"""Conditional-family learning-evidence run on the real chip (VERDICT r3
item 4b).

Round 3 measured the DUTS sliding-window eval machinery at RANDOM weights
(PSNR 7.52 floor); this run shows a conditional model LEARNS: train a
saliency-shaped cond DDM (cond = 3ch shapes image -> target = 1ch
foreground mask) on procedural pairs, then run the REAL sliding-window +
flip-test eval (core/slide.py, the reference sample_cond_ldm.py:158-218
protocol) on held-out 256x256 pairs at two checkpoints — PSNR must clear
the random floor and RISE between checkpoints.

Config: image-space cond_unet (conv cond encoder) at 128x128 train crops,
sliding-window 128/stride 64 eval on 256x256, the exact train_cond_dpm
family (SURVEY 2.2 cond_unet / 2.6 sample_cond_ldm).

Writes results/cond_learn/{learn.csv, results.json, pred-*.png}.
Usage: python tools/cond_learn.py [steps=3000]   (on the axon TPU)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path("results/cond_learn")
LOG_EVERY = 100
BATCH = 32
RES = 128  # train crop
EVAL_RES = 256  # held-out full images, sliding-window 128/64

MODEL_CFG = {
    "class_name": "ddm.ddm_const.DDPM",
    "image_size": [RES, RES],
    "sampling_timesteps": 10,
    "loss_type": "l2",
    "start_dist": "normal",
    "perceptual_weight": 0.0,
    "eps": 1e-4,
    "weighting_loss": True,
    "unet": {
        "class_name": "unet.cond_unet_sd.Unet",
        "dim": 48,
        "dim_mults": [1, 2, 4],
        "channels": 1,
        "cond_in_dim": 3,
        "cond_net": "conv",
        "window_sizes1": [[8, 8], [4, 4], [2, 2]],
        "window_sizes2": [[8, 8], [4, 4], [2, 2]],
        "resnet_block_groups": 8,
    },
}


def psnr(pred: np.ndarray, target: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((pred - target) ** 2))
    return 10.0 * np.log10(max_val**2 / max(mse, 1e-12))


def main():
    import os

    # env knobs for reduced-scale smoke/fallback runs (same pattern as
    # vae_learn; chip defaults unchanged):
    #   ADM_TPU_COND_LEARN_RES    train crop (default 128)
    #   ADM_TPU_COND_LEARN_EVAL   eval image side (default 2*res)
    #   ADM_TPU_COND_LEARN_BATCH  batch (default 32)
    #   ADM_TPU_COND_LEARN_DIM    unet dim (default 48)
    #   ADM_TPU_COND_LEARN_OUT    results dir (default results/cond_learn)
    #   ADM_TPU_COND_LEARN_NEVAL  held-out eval images (default 6; the
    #                             first run's n=2 made per-checkpoint PSNR
    #                             noisy enough to wobble mid->final)
    global OUT, RES, EVAL_RES, BATCH
    RES = int(os.environ.get("ADM_TPU_COND_LEARN_RES", str(RES)))
    EVAL_RES = int(os.environ.get("ADM_TPU_COND_LEARN_EVAL", str(2 * RES)))
    BATCH = int(os.environ.get("ADM_TPU_COND_LEARN_BATCH", str(BATCH)))
    n_eval = int(os.environ.get("ADM_TPU_COND_LEARN_NEVAL", "6"))
    n_eval = max(2, n_eval - n_eval % 2)  # chunks of 2 share one jit shape
    MODEL_CFG["image_size"] = [RES, RES]
    MODEL_CFG["unet"]["dim"] = int(
        os.environ.get("ADM_TPU_COND_LEARN_DIM", MODEL_CFG["unet"]["dim"])
    )
    OUT = Path(os.environ.get("ADM_TPU_COND_LEARN_OUT", str(OUT)))
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    OUT.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from adm_tpu.core.slide import slide_sample
    from adm_tpu.data import batch_iterator
    from adm_tpu.data.synthetic import ShapesPairedDataset
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer
    from adm_tpu.utils.config import build_model
    from adm_tpu.utils.image import save_image_grid

    model = build_model(MODEL_CFG)
    data = ShapesPairedDataset(image_size=(RES, RES), task="saliency")
    it = batch_iterator(data, batch_size=BATCH, seed=0)

    trainer = Trainer(
        model, it,
        train_num_steps=steps, train_lr=2e-4, warmup_steps=200,
        gradient_accumulate_every=1, save_and_sample_every=0, log_freq=LOG_EVERY,
        results_folder=str(OUT),
        ema_cfg=EmaConfig(update_after_step=200, update_every=4),
    )

    # held-out eval pairs (disjoint seed stream from the training set);
    # evaluated in CHUNKS of 2 so the jitted slide-crop shape matches the
    # original n=2 run and reuses its compilation-cache entry
    eval_data = ShapesPairedDataset(
        image_size=(EVAL_RES, EVAL_RES), task="saliency", seed=7
    )
    eval_pairs = [eval_data[i] for i in range(n_eval)]
    conds = [
        jnp.asarray(np.stack([p["cond"] for p in eval_pairs[i : i + 2]]))
        for i in range(0, n_eval, 2)
    ]
    target01 = np.stack([(p["image"] + 1) / 2 for p in eval_pairs])

    # weights as ARGUMENTS (axon HTTP 413 rule); crop sampler in [0,1]
    _jit_crop = jax.jit(lambda w, c, k: model.sample(w, k, cond=c))

    def eval_psnr(tag: str) -> float:
        w = trainer.state.ema_params
        # average over two sampler keys: the 10-step stochastic sampler's
        # per-key variance wobbled the n=2 single-key run by ~1.7 dB
        preds = []
        for key in (5, 6):
            preds.append(np.concatenate([
                slide_sample(
                    lambda c, k: _jit_crop(w, c, k), cond,
                    (RES, RES), (RES // 2, RES // 2), jax.random.PRNGKey(key),
                    out_channels=1, flip_test=True,
                )
                for cond in conds
            ]))
        pred = np.mean(preds, axis=0)
        save_image_grid(
            np.concatenate([target01, np.clip(pred, 0, 1)]),
            str(OUT / f"pred-{tag}.png"), nrow=n_eval,
        )
        val = float(np.mean([psnr(pred[i], target01[i]) for i in range(len(pred))]))
        print(f"[cond_learn] PSNR@{tag} = {val:.3f}", flush=True)
        return val

    results = {"steps": steps, "batch": BATCH, "res": RES, "n_eval": n_eval,
               "eval": f"{EVAL_RES} sliding {RES}/{RES // 2} + flip, 2-key avg"}
    t0 = time.time()
    results["psnr_random"] = eval_psnr("random")  # floor + compiles eval
    train_secs = 0.0  # train() timed alone: the sliding-window evals and
    trend = []        # their compiles must not dilute the throughput row
    checkpoints = [steps // 3, 2 * steps // 3, steps]
    for target_step in checkpoints:
        t1 = time.time()
        trainer.train(num_steps=target_step)
        train_secs += time.time() - t1
        trend.append(
            {"step": target_step, "psnr": eval_psnr(f"s{target_step}")}
        )
    results["psnr_trend"] = trend
    results["psnr_mid"] = trend[len(trend) // 2 - 1]["psnr"] if len(trend) > 1 else None
    results["psnr_final"] = trend[-1]["psnr"]
    results["wall_seconds"] = round(time.time() - t0, 1)
    results["train_seconds"] = round(train_secs, 1)
    results["imgs_per_sec_train"] = round(
        BATCH * steps / max(train_secs, 1e-9), 1
    )
    # VERDICT r3 item 4b criterion: clears the random floor and rises
    # between two trained checkpoints (first -> final)
    results["learned"] = bool(
        results["psnr_final"] > trend[0]["psnr"] > results["psnr_random"]
    )
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
