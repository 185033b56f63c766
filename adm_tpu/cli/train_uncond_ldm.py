"""Unconditional latent DDM training CLI (reference train_uncond_ldm.py)."""

from __future__ import annotations

import argparse

from adm_tpu.cli._common import run_training


def main():
    p = argparse.ArgumentParser(description="train unconditional latent DDM")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-steps", type=int, default=None)
    run_training(p.parse_args(), conditional=False, latent=True)


if __name__ == "__main__":
    main()
