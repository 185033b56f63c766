"""Unconditional image-space DDPM training CLI.

Same surface as the reference `python train_uncond_dpm.py --cfg <yaml>`
(train_uncond_dpm.py:19-114) driven by the same YAML schema, running the
GSPMD trainer instead of accelerate/DDP.
"""

from __future__ import annotations

import argparse
import logging
import math

import jax

from adm_tpu.data.loader import batch_iterator
from adm_tpu.train.state import EmaConfig
from adm_tpu.train.trainer import Trainer
from adm_tpu.utils.config import build_dataset, build_model, load_conf
from adm_tpu.utils.image import save_image_grid


def parse_args():
    p = argparse.ArgumentParser(description="train unconditional DDM (image space)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-steps", type=int, default=None, help="override train_num_steps")
    return p.parse_args()


def sample_grid(trainer: Trainer, milestone):
    key = jax.random.PRNGKey(int(trainer.state.step))
    imgs = trainer._sample(trainer.state.ema_params, key)
    nrow = 2 ** int(math.floor(math.log2(math.sqrt(imgs.shape[0]))))
    path = str(trainer.results_folder / f"sample-{milestone}.png")
    save_image_grid(jax.device_get(imgs), path, nrow=nrow)
    logging.getLogger("adm_tpu").info("wrote %s", path)


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()
    cfg = load_conf(args.cfg)
    model_cfg, data_cfg, train_cfg = cfg["model"], cfg["data"], cfg["trainer"]

    model = build_model(model_cfg)
    dataset = build_dataset(data_cfg)
    data_iter = batch_iterator(dataset, data_cfg["batch_size"])

    trainer = Trainer(
        model,
        data_iter,
        train_num_steps=args.num_steps or train_cfg["train_num_steps"],
        train_lr=float(train_cfg["lr"]),
        min_lr=float(train_cfg.get("min_lr", 5e-6)),
        warmup_steps=int(train_cfg.get("warmup_iter", 5000)),
        weight_decay=float(train_cfg.get("weight_decay", 1e-4)),
        gradient_accumulate_every=int(train_cfg.get("gradient_accumulate_every", 1)),
        save_and_sample_every=int(train_cfg.get("save_and_sample_every", 10000)),
        log_freq=int(train_cfg.get("log_freq", 500)),
        results_folder=train_cfg["results_folder"],
        ema_cfg=EmaConfig(
            update_after_step=int(train_cfg.get("ema_update_after_step", 10000)),
            update_every=int(train_cfg.get("ema_update_every", 8)),
        ),
        resume_milestone=int(train_cfg.get("resume_milestone", 0)),
        sample_batch_size=min(int(data_cfg["batch_size"]), 64),
    )
    if train_cfg.get("test_before", False):
        sample_grid(trainer, f"init-{model_cfg.get('sampling_timesteps', 10)}")
    trainer.train(sample_fn=sample_grid)


if __name__ == "__main__":
    main()
