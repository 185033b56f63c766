"""Export a trained sampler as a standalone StableHLO artifact.

The serving counterpart of the training CLIs: loads a milestone
checkpoint, AOT-serializes the FULL sampling program (adm_tpu/serve) for
the requested platforms, and writes <out>.stablehlo plus the weights as
<out>.params.npz if asked. A server then needs only `jax.export` +
the artifact — no model zoo, configs, or flax. Latent configs bake the
VAE decode into the program (first-stage params become the artifact's
second argument).

Usage:
    python -m adm_tpu.cli.export_model --cfg cfg.yaml --milestone 10 \
        --out model --platforms tpu cpu
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import numpy as np

from adm_tpu.cli._common import (
    load_first_stage,
    restore_train_state,
    with_restored_scale,
)
from adm_tpu.serve import export_sampler
from adm_tpu.utils.config import build_model, load_conf

log = logging.getLogger("adm_tpu")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser(description="export sampler to StableHLO")
    p.add_argument("--cfg", required=True)
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--out", required=True, help="output stem")
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--no-ema", dest="use_ema", action="store_false")
    p.add_argument("--fixed-batch", type=int, default=None,
                   help="export a fixed batch instead of symbolic")
    p.add_argument("--save-params", action="store_true",
                   help="also write <out>.params.npz")
    p.add_argument("--encoder-reuse", type=int, default=1, metavar="K",
                   help="bake encoder-propagation sampling: recompute the "
                        "UNet encoder every K steps (1 = exact reference "
                        "sampler; quality table in BASELINE.md)")
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="bake sampler order: 1 = reference Euler step, "
                        "2 = Heun (deterministic family only)")
    args = p.parse_args(argv)

    cfg = load_conf(args.cfg)
    from adm_tpu.utils.config import normalize_model_cfg

    _, mcfg = normalize_model_cfg(cfg["model"])
    latent = "first_stage" in mcfg
    fs = fs_params = None
    if latent:
        fs, fs_params = load_first_stage(cfg)
    model = build_model(cfg["model"], first_stage=fs)

    ckpt = args.ckpt_path or cfg.get("sampler", {}).get("ckpt_path")
    if args.milestone is not None:
        ckpt = str(
            Path(cfg["trainer"]["results_folder"]) / f"model-{args.milestone}"
        )
    if not ckpt:
        log.warning("no checkpoint given — exporting with INITIAL weights")
    state = restore_train_state(model, ckpt)
    model = with_restored_scale(model, state)
    weights = state.ema_params if args.use_ema else state.params

    data = export_sampler(
        model,
        weights,
        path=f"{args.out}.stablehlo",
        platforms=args.platforms,
        fs_params=fs_params,
        # conditional models expose the cond input in the artifact
        cond_shape=getattr(model, "cond_shape", None),
        symbolic_batch=args.fixed_batch is None,
        batch_size=args.fixed_batch or 1,
        encoder_reuse=args.encoder_reuse,
        order=args.order,
    )
    log.info("wrote %s.stablehlo (%.1f KiB)", args.out, len(data) / 1024)
    if args.save_params:
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(weights)[0]
        }
        np.savez(f"{args.out}.params.npz", **flat)
        log.info("wrote %s.params.npz (%d arrays)", args.out, len(flat))
    return data


if __name__ == "__main__":
    main()
