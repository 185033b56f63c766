"""DUTS conditional sliding-window eval smoke on the real chip (VERDICT r3
item #10): first TPU exercise of core/slide.py + the swin backbone path.

Derives a config from configs/saliency/DUTS_sample_114.yaml (swin-conditioned
latent DDM, 1-channel saliency decode, 384 crops) with:
  - procedural ShapesPairedDataset 512x512 pairs (no DUTS data mounted),
  - sliding window 384/stride 128 (2x2 windows) + flip-test ensembling,
  - random-init weights (no trained checkpoint exists for this family; the
    object is shapes/compile/throughput + the PSNR machinery, not quality).

Runs the REAL adm_tpu.cli.sample_cond_ldm module in-process, times it, and
writes results/cond_onchip/results.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import yaml

OUT = Path("results/cond_onchip")
SRC = "adm_tpu/configs/saliency/DUTS_sample_114.yaml"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    cfg = yaml.safe_load(open(SRC))
    cfg["model"]["first_stage"]["ckpt_path"] = None
    cfg["data"] = {
        "class_name": "adm_tpu.data.ShapesPairedDataset",
        "image_size": [512, 512],
        "task": "saliency",
        "length": 4,
        "batch_size": 2,
    }
    cfg["sampler"].update(
        batch_size=2,
        crop_size=[384, 384],
        stride=[128, 128],
        flip_test=True,
        ckpt_path=None,
        save_folder=str(OUT / "samples"),
    )
    cfg_path = OUT / "duts_onchip.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "adm_tpu.cli.sample_cond_ldm",
         "--cfg", str(cfg_path), "--num-batches", "2"],
        capture_output=True, text=True,
        cwd=str(Path(__file__).resolve().parents[1]),
        env={**os.environ},
    )
    wall = time.time() - t0
    log_text = proc.stdout + proc.stderr
    (OUT / "run.log").write_text(log_text)
    m = re.search(r"FINAL PSNR over (\d+) batches: ([0-9.]+)", log_text)
    batch_times = [float(x) for x in
                   re.findall(r"batch \d+ done in ([0-9.]+)s", log_text)]
    n_img = 4  # 2 batches x 2 images
    results = {
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        "images": n_img,
        "windows_per_image": 8,  # 2x2 crops x 2 (flip ensembling)
        "psnr_random_weights": float(m.group(2)) if m else None,
        "batch_times_s": batch_times,
        "steady_s_per_image": (round(batch_times[-1] / 2, 1)
                               if len(batch_times) > 1 else None),
        "note": "random-init weights; PSNR is machinery proof, not quality",
    }
    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)
    if proc.returncode != 0:
        print(log_text[-3000:], flush=True)


if __name__ == "__main__":
    main()
