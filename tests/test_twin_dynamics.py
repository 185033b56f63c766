"""Twin-training dynamics parity (VERDICT r3 item 1): the PRODUCTION jitted
train step must reproduce the reference torch training loop step-for-step —
same converted-identical init, same data, one shared (t, noise) stream.

Composes what the per-piece parity suites test separately: forward math,
AdamW + warmup-poly LR (train_uncond_dpm.py:169-182), global-norm clip
(:297), update order (:301-305), and the post-step EMA (ddm/ema.py:141-156).
Tolerances from the measured 200-step run (BASELINE.md "twin-training
dynamics parity"): loss rel diff O(1e-4), param/EMA trajectory rel diff
O(1e-5) — an algorithmic mismatch (wrong weighting, LR phase, EMA gating)
shows up orders of magnitude above these.
"""

import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.mark.slow
def test_twin_training_dynamics(tmp_path):
    from twin_train import run_twin

    report = run_twin(steps=30, batch=8, compare_every=30,
                      out_dir=str(tmp_path), log=lambda *a: None)
    assert report["max_loss_rel_diff"] < 2e-3, (
        "per-step loss curves diverged between the reference torch loop "
        f"and the production JAX step: {report['max_loss_rel_diff']}"
    )
    assert report["max_lr_rel_diff"] < 1e-5, "LR schedules diverged"
    final = report["final"]
    assert final["param_rel"] < 1e-3, (
        f"parameter trajectory diverged after 30 steps: {final}"
    )
    assert final["ema_rel"] < 1e-3, (
        f"EMA trajectory diverged after 30 steps: {final}"
    )
