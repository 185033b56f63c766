"""Unconditional sampling/eval CLI (reference sample_uncond.py:38-180).

Loads a milestone checkpoint (EMA or online weights), writes `sample_num`
PNGs in batches. FID hookup lands with adm_tpu.metrics (on-device
InceptionV3) — the reference shells out to the `fidelity` CLI instead
(sample_uncond.py:177-180).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
from pathlib import Path

import jax
import numpy as np

from adm_tpu.utils.config import build_model, load_conf
from adm_tpu.utils.image import save_image

log = logging.getLogger("adm_tpu")


def parse_args():
    p = argparse.ArgumentParser(description="sample unconditional DDM")
    p.add_argument("--cfg", required=True)
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--sample-num", type=int, default=None)
    p.add_argument(
        "--rk45", action="store_true",
        help="use the adaptive probability-flow ODE sampler (on-device RK45)",
    )
    p.add_argument(
        "--encoder-reuse", type=int, default=1, metavar="K",
        help="run the UNet encoder every K-th denoising step, decoders "
             "only in between (encoder propagation, arXiv 2312.09608); "
             "1 = exact reference sampler",
    )
    p.add_argument(
        "--order", type=int, default=1, choices=(1, 2),
        help="deterministic-sampler order: 1 = reference Euler step, "
             "2 = Heun (re-evaluate at the landing point, average the "
             "estimates; 2 model evals per step)",
    )
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()
    cfg = load_conf(args.cfg)
    model_cfg, sampler_cfg = cfg["model"], cfg["sampler"]
    model = build_model(model_cfg)

    batch_size = int(sampler_cfg.get("batch_size", 64))
    sample_num = args.sample_num or int(sampler_cfg.get("sample_num", 50000))
    use_ema = bool(sampler_cfg.get("use_ema", True))
    save_folder = Path(sampler_cfg["save_folder"])
    save_folder.mkdir(parents=True, exist_ok=True)

    # restore state (shared helper: jitted init + orbax restore)
    from adm_tpu.cli._common import restore_train_state, with_restored_scale

    ckpt_path = sampler_cfg.get("ckpt_path")
    if args.milestone is not None:
        ckpt_path = str(
            Path(cfg["trainer"]["results_folder"]) / f"model-{args.milestone}"
        )
    state = restore_train_state(model, ckpt_path, required=True)
    model = with_restored_scale(model, state)
    weights = state.ema_params if use_ema else state.params

    if args.rk45 and (args.encoder_reuse != 1 or args.order != 1):
        raise SystemExit(
            "--encoder-reuse/--order apply to the few-step sampler only; "
            "the adaptive RK45 ODE path has no fixed step grid to reuse "
            "the encoder across (and is already high-order) — drop a flag"
        )
    if args.rk45:
        from adm_tpu.core.ode import rk45_sample

        h, w = model.image_size

        if model.process_name not in ("const", "const2"):
            raise SystemExit(
                f"--rk45 implements the const/const2 probability-flow drift "
                f"only; process '{model.process_name}' would integrate the "
                "wrong vector field (core/ode.py:128-136)"
            )

        def _rk45(p, k):
            fn = model._model_fn(p)
            img, nfe = rk45_sample(
                model.process, fn, (batch_size, h, w, model.channels), k
            )
            return img

        sample = jax.jit(_rk45)
    else:
        sample = jax.jit(
            lambda p, k: model.sample(p, k, batch_size=batch_size,
                                      unnormalize=True,
                                      encoder_reuse=args.encoder_reuse,
                                      order=args.order)
        )
    batch_num = math.ceil(sample_num / batch_size)
    written = 0
    for idx in range(batch_num):
        imgs = np.asarray(sample(weights, jax.random.PRNGKey(idx)))
        take = min(batch_size, sample_num - written)
        for j in range(take):
            save_image(imgs[j], str(save_folder / f"{written + j:010d}.png"))
        written += take
        if idx % 10 == 0:
            log.info("sampled %d/%d", written, sample_num)
    log.info("done: %d images in %s", written, save_folder)

    # on-device FID vs the target set (replaces the reference's external
    # `fidelity` CLI shell-out, sample_uncond.py:177-180)
    target = sampler_cfg.get("target_path")
    if target and os.path.isdir(target):
        try:
            from adm_tpu.metrics.metric import calculate_metrics

            res = calculate_metrics(str(save_folder), target, fid=True)
            log.info("FID: %.4f", res["frechet_inception_distance"])
            import json

            with open(save_folder.parent / "fid_result.json", "w") as f:
                json.dump(res, f)
        except FileNotFoundError as e:
            log.warning("FID skipped: %s", e)


if __name__ == "__main__":
    main()
