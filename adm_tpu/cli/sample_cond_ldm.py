"""Conditional eval CLI: sliding-window sampling + PSNR
(reference sample_cond_ldm.py:90-434).

Iterates a validation dataset, runs the (latent) conditional sampler over
overlapping crops with flip-test ensembling, accumulates PSNR, writes PNGs.
"""

from __future__ import annotations

import argparse
import logging
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.cli._common import load_first_stage
from adm_tpu.core.slide import slide_sample
from adm_tpu.data.loader import batch_iterator
from adm_tpu.utils.config import build_dataset, build_model, load_conf
from adm_tpu.utils.image import save_image

log = logging.getLogger("adm_tpu")


def psnr(pred: np.ndarray, target: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((pred - target) ** 2))
    return 10 * math.log10(max_val**2 / max(mse, 1e-12))


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description="conditional sliding-window eval")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-batches", type=int, default=None)
    args = p.parse_args()
    cfg = load_conf(args.cfg)
    model_cfg, data_cfg, sampler_cfg = cfg["model"], cfg["data"], cfg["sampler"]

    from adm_tpu.utils.config import normalize_model_cfg

    latent = "first_stage" in normalize_model_cfg(model_cfg)[1]
    fs = fs_params = None
    if latent:
        fs, fs_params = load_first_stage(cfg)
    model = build_model(model_cfg, first_stage=fs)

    # restore weights (shared helper: jitted init + orbax restore)
    from adm_tpu.cli._common import restore_train_state, with_restored_scale

    state = restore_train_state(model, sampler_cfg.get("ckpt_path"))
    model = with_restored_scale(model, state)
    weights = state.ema_params if sampler_cfg.get("use_ema", True) else state.params

    dataset = build_dataset(data_cfg)
    data_iter = batch_iterator(
        dataset, int(sampler_cfg.get("batch_size", 1)), shuffle=False,
        # eval: one pass, scoring the tail of the validation set too
        drop_last=False, loop=False,
    )
    save_folder = Path(sampler_cfg["save_folder"])
    save_folder.mkdir(parents=True, exist_ok=True)

    # weights/fs as ARGUMENTS of the jitted fn — closures embed the pytrees
    # as HLO constants and hit the axon remote-compile 413 limit (CLAUDE.md)
    if latent:
        _jit_crop = jax.jit(
            lambda w, fs, c, k: model.sample(w, k, cond=c, fs_params=fs)
        )
        sample_crop = lambda c, k: _jit_crop(weights, fs_params, c, k)
    else:
        _jit_crop = jax.jit(lambda w, c, k: model.sample(w, k, cond=c))
        sample_crop = lambda c, k: _jit_crop(weights, c, k)
    crop = tuple(sampler_cfg.get("crop_size", model.image_size))
    stride = tuple(sampler_cfg.get("stride", crop))
    flip_test = bool(sampler_cfg.get("flip_test", False))

    psnrs = []
    n_batches = args.num_batches or int(sampler_cfg.get("num_batches", 10**9))
    written = 0
    import time as _time

    for idx in range(n_batches):
        try:
            batch = next(data_iter)
        except StopIteration:
            break
        t_batch = _time.time()
        cond = jnp.asarray(batch["cond"])
        pred = slide_sample(
            sample_crop,
            cond,
            crop,
            stride,
            jax.random.PRNGKey(idx),
            # latent: the DECODED channel count (1 for DUTS saliency masks,
            # ddconfig.out_ch), not the latent channels
            out_channels=(
                fs.module.ddconfig["out_ch"] if latent else model.channels
            ),
            flip_test=flip_test,
        )
        if "image" in batch:
            target = (np.asarray(batch["image"]) + 1) / 2
            psnrs.append(psnr(pred, target))
        for j in range(pred.shape[0]):
            save_image(pred[j], str(save_folder / f"{written + j:08d}.png"))
        written += pred.shape[0]
        # per-batch wall time: batch 0 carries the compile, later batches
        # are the steady rate (np.asarray in save_image fences the device)
        log.info("batch %d done in %.2fs, psnr so far: %.3f", idx,
                 _time.time() - t_batch,
                 float(np.mean(psnrs)) if psnrs else float("nan"))
    if psnrs:
        log.info("FINAL PSNR over %d batches: %.4f", len(psnrs), float(np.mean(psnrs)))
    log.info("wrote %d images to %s", written, save_folder)


if __name__ == "__main__":
    main()
