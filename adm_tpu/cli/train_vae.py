"""AutoencoderKL (first-stage VAE) training CLI (reference train_vae.py).

Same YAML schema (model.ddconfig / model.lossconfig / data / trainer).
"""

from __future__ import annotations

import argparse
import logging

import jax
import numpy as np

from adm_tpu.data.loader import batch_iterator
from adm_tpu.train.state import EmaConfig
from adm_tpu.utils.config import build_dataset, load_conf
from adm_tpu.utils.image import save_image_grid
from adm_tpu.vae.autoencoder import AutoencoderKL
from adm_tpu.vae.losses import VAELossConfig
from adm_tpu.vae.trainer import VAETrainer


def parse_args():
    p = argparse.ArgumentParser(description="train first-stage KL-VAE")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-steps", type=int, default=None)
    return p.parse_args()


_DDCONFIG_KEYS = (
    "double_z", "z_channels", "resolution", "in_channels", "out_ch", "ch",
    "ch_mult", "num_res_blocks", "attn_resolutions", "dropout",
)


def build_vae(model_cfg) -> AutoencoderKL:
    # filter to the supported ddconfig surface (the fork's PL config carries
    # ldm extras like tanh_out/monitor, uncond_ddm_ldm_pl.yaml:44-48)
    dd = {k: v for k, v in dict(model_cfg["ddconfig"]).items()
          if k in _DDCONFIG_KEYS}
    dd["resolution"] = (
        tuple(dd["resolution"]) if isinstance(dd["resolution"], list)
        else dd["resolution"]
    )
    dd["ch_mult"] = tuple(dd["ch_mult"])
    dd["attn_resolutions"] = tuple(dd.get("attn_resolutions", ()))
    return AutoencoderKL(ddconfig=dd, embed_dim=model_cfg["embed_dim"])


def recon_grid(trainer: VAETrainer, milestone, batch):
    import jax.numpy as jnp

    x = jnp.asarray(batch["image"][:16])
    rec = trainer._recon(trainer.state.ae_params, x, jax.random.PRNGKey(0))
    pair = np.concatenate(
        [np.asarray((x + 1) / 2), np.clip(np.asarray((rec + 1) / 2), 0, 1)], axis=0
    )
    path = str(trainer.results_folder / f"recon-{milestone}.png")
    save_image_grid(pair, path, nrow=x.shape[0])
    logging.getLogger("adm_tpu").info("wrote %s", path)


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()
    cfg = load_conf(args.cfg)
    model_cfg, data_cfg, train_cfg = cfg["model"], cfg["data"], cfg["trainer"]

    module = build_vae(model_cfg)
    dataset = build_dataset(data_cfg)
    data_iter = batch_iterator(dataset, data_cfg["batch_size"])
    lc = model_cfg.get("lossconfig", {})
    h, w = data_cfg.get("image_size", model_cfg["ddconfig"]["resolution"])

    first_batch = next(data_iter)
    trainer = VAETrainer(
        module,
        data_iter,
        image_size=(h, w),
        in_channels=model_cfg["ddconfig"]["in_channels"],
        loss_cfg=VAELossConfig(
            disc_start=int(lc.get("disc_start", 50001)),
            kl_weight=float(lc.get("kl_weight", 1e-6)),
            disc_weight=float(lc.get("disc_weight", 0.5)),
            disc_in_channels=model_cfg["ddconfig"]["out_ch"],
        ),
        train_num_steps=args.num_steps or int(train_cfg["train_num_steps"]),
        train_lr=float(train_cfg["lr"]),
        min_lr=float(train_cfg.get("min_lr", 5e-6)),
        warmup_steps=int(train_cfg.get("warmup_iter", 5000)),
        log_freq=int(train_cfg.get("log_freq", 100)),
        save_and_sample_every=int(train_cfg.get("save_and_sample_every", 10000)),
        results_folder=train_cfg["results_folder"],
        ema_cfg=EmaConfig(update_after_step=0, update_every=1),
    )
    trainer.train(recon_fn=lambda tr, m: recon_grid(tr, m, first_batch))


if __name__ == "__main__":
    main()
