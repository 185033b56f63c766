"""Conditional image-space DDM training CLI (reference train_cond_dpm.py)."""

from __future__ import annotations

import argparse

from adm_tpu.cli._common import run_training


def main():
    p = argparse.ArgumentParser(description="train conditional DDM (image space)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-steps", type=int, default=None)
    run_training(p.parse_args(), conditional=True, latent=False)


if __name__ == "__main__":
    main()
