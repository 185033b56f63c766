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
    global OUT, RES, EVAL_RES, BATCH
    RES = int(os.environ.get("ADM_TPU_COND_LEARN_RES", str(RES)))
    EVAL_RES = int(os.environ.get("ADM_TPU_COND_LEARN_EVAL", str(2 * RES)))
    BATCH = int(os.environ.get("ADM_TPU_COND_LEARN_BATCH", str(BATCH)))
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

    # held-out eval pairs (disjoint seed stream from the training set)
    eval_data = ShapesPairedDataset(
        image_size=(EVAL_RES, EVAL_RES), task="saliency", seed=7
    )
    eval_pairs = [eval_data[i] for i in range(2)]
    cond = jnp.asarray(np.stack([p["cond"] for p in eval_pairs]))
    target01 = np.stack([(p["image"] + 1) / 2 for p in eval_pairs])

    # weights as ARGUMENTS (axon HTTP 413 rule); crop sampler in [0,1]
    _jit_crop = jax.jit(lambda w, c, k: model.sample(w, k, cond=c))

    def eval_psnr(tag: str) -> float:
        w = trainer.state.ema_params
        pred = slide_sample(
            lambda c, k: _jit_crop(w, c, k), cond,
            (RES, RES), (RES // 2, RES // 2), jax.random.PRNGKey(5),
            out_channels=1, flip_test=True,
        )
        save_image_grid(
            np.concatenate([target01, np.clip(pred, 0, 1)]),
            str(OUT / f"pred-{tag}.png"), nrow=2,
        )
        val = float(np.mean([psnr(pred[i], target01[i]) for i in range(len(pred))]))
        print(f"[cond_learn] PSNR@{tag} = {val:.3f}", flush=True)
        return val

    results = {"steps": steps, "batch": BATCH, "res": RES,
               "eval": f"{EVAL_RES} sliding {RES}/{RES // 2} + flip"}
    t0 = time.time()
    results["psnr_random"] = eval_psnr("random")  # floor + compiles eval
    mid = steps // 2
    train_secs = 0.0  # train() timed alone: the sliding-window evals and
    t1 = time.time()  # their compiles must not dilute the throughput row
    trainer.train(num_steps=mid)
    train_secs += time.time() - t1
    results["psnr_mid"] = eval_psnr(f"mid{mid}")
    t1 = time.time()
    trainer.train(num_steps=steps)
    train_secs += time.time() - t1
    results["psnr_final"] = eval_psnr(f"final{steps}")
    results["wall_seconds"] = round(time.time() - t0, 1)
    results["train_seconds"] = round(train_secs, 1)
    results["imgs_per_sec_train"] = round(
        BATCH * steps / max(train_secs, 1e-9), 1
    )
    results["learned"] = bool(
        results["psnr_final"] > results["psnr_mid"] > results["psnr_random"]
    )
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
