"""Quality-axis twin parity (VERDICT r3 items 1+3): both frameworks train
lockstep on the same shapes stream and their EMA-sample proxy-FID
trajectories must coincide on the anchor-calibrated scale.

Extends test_twin_dynamics from "the losses/params match" to "the metric
the acceptance gate reads matches": EMA samples are drawn at matched
milestones from identical init noise (torch.randn bridged into both
samplers) and scored on the same fixed random-init Inception '192'
features with noise/held-out anchor rows (tools/quality_anchors.py
methodology, BASELINE.md "quality-trend acceptance gate").

Tolerance from the measured runs: 16-step smoke 0.15%, 8-step smoke
0.04% of the noise-heldout anchor span — a sampler/EMA mismatch (wrong
gating phase, wrong sigma schedule) shows up at tens of percent.
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.slow
def test_twin_quality_trajectories(tmp_path):
    from twin_quality import run_quality

    report = run_quality(steps=8, batch=4, out_dir=str(tmp_path),
                         n_sample=16, n_ref=64, log=lambda *a: None)
    # anchors must separate (noise scores far above held-out real data)
    assert report["anchor_noise"] > 3 * report["anchor_heldout"], report
    assert len(report["milestones"]) >= 4
    # both trajectories live on the calibrated scale and coincide
    assert report["max_traj_gap_frac_of_anchor_span"] < 0.02, (
        "EMA-sample proxy-FID trajectories diverged between the reference "
        f"torch loop and the production JAX step: {report}"
    )
    # the matched-noise samples themselves must agree pixelwise
    for m in report["milestones"]:
        assert m["sample_mean_abs_diff"] < 1e-2, m
