"""End-to-end drive of the conditional sliding-window eval CLI
(adm_tpu.cli.sample_cond_ldm — reference sample_cond_ldm.py:90-434):
latent model with a 1-CHANNEL decode (DUTS saliency contract), procedural
paired data larger than the crop so the window loop + flip ensembling and
PSNR accumulation actually execute."""

import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_sample_cond_ldm_cli_latent_1ch(tmp_path, monkeypatch):
    import yaml

    cfg = yaml.safe_load(
        (REPO / "tests/configs/tiny_cond_sample.yaml").read_text()
    )
    save = tmp_path / "samples"
    cfg["sampler"]["save_folder"] = str(save)
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    monkeypatch.setattr(
        sys, "argv",
        ["sample_cond_ldm", "--cfg", str(cfg_path), "--num-batches", "2"],
    )
    runpy.run_module("adm_tpu.cli.sample_cond_ldm", run_name="__main__")
    pngs = sorted(save.glob("*.png"))
    assert len(pngs) == 4  # 2 batches x 2 images
    from PIL import Image

    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape[:2] == (48, 48)  # whole-image output, not the crop
