"""Pin tools/gate_verdict.py's recalibrated pass logic (VERDICT r4 #3).

The gate is now fraction-of-anchor-span <= 0.177 (derivation in the tool
docstring + BASELINE.md). These tests drive main() against fixture JSONs
and pin: the frac computation, the pass boundary, the stale-protocol
fallback to the trend value, and the recorded legacy verdict.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "gate_verdict", REPO / "tools/gate_verdict.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.OUT = tmp_path
    return mod


def _write(tmp_path, *, trend, anchors=None, fid_eval=None):
    (tmp_path / "quality_trend.json").write_text(json.dumps(trend))
    (tmp_path / "anchors.json").write_text(json.dumps(
        anchors or {"noise_anchor": 0.8, "heldout_anchor": 0.0}))
    if fid_eval is not None:
        (tmp_path / "fid_eval.json").write_text(json.dumps(fid_eval))


def _run(mod, capsys):
    mod.main()
    return json.loads(capsys.readouterr().out)


def test_pass_at_fraction_below_gate(tmp_path, capsys):
    mod = _load(tmp_path)
    _write(tmp_path,
           trend=[{"milestone": 80, "step": 160000, "proxy_fid": 0.12}],
           fid_eval={"milestone": 80, "step": 160000, "proxy_fid": 0.12})
    v = _run(mod, capsys)
    assert v["frac_of_anchor_span"] == 0.15
    assert v["passed"] is True
    assert v["passed_legacy_abs"] is False
    assert v["gate_frac_of_span"] == 0.177


def test_fail_above_gate(tmp_path, capsys):
    mod = _load(tmp_path)
    _write(tmp_path,
           trend=[{"milestone": 10, "step": 20000, "proxy_fid": 0.16}],
           fid_eval={"milestone": 10, "step": 20000, "proxy_fid": 0.16})
    v = _run(mod, capsys)
    assert v["frac_of_anchor_span"] == 0.2
    assert v["passed"] is False


def test_stale_protocol_falls_back_to_trend(tmp_path, capsys):
    """An fid_eval from an older milestone must not be judged as the
    end-of-run number — the trend's final value is judged instead."""
    mod = _load(tmp_path)
    _write(tmp_path,
           trend=[{"milestone": 50, "step": 100000, "proxy_fid": 0.30},
                  {"milestone": 80, "step": 160000, "proxy_fid": 0.10}],
           fid_eval={"milestone": 50, "step": 100000, "proxy_fid": 0.30})
    v = _run(mod, capsys)
    assert v["protocol_pass_stale"] is True
    assert v["value_judged"] == 0.10
    assert v["passed"] is True  # 0.125 of span


def test_heldout_anchor_shifts_the_fraction(tmp_path, capsys):
    mod = _load(tmp_path)
    _write(tmp_path,
           trend=[{"milestone": 1, "step": 2000, "proxy_fid": 0.119}],
           anchors={"noise_anchor": 0.8353, "heldout_anchor": -0.0083},
           fid_eval={"milestone": 1, "step": 2000, "proxy_fid": 0.119})
    v = _run(mod, capsys)
    # (0.119 + 0.0083) / (0.8353 + 0.0083) = 0.1509 — the live 136k value
    assert v["frac_of_anchor_span"] == 0.1509
    assert v["passed"] is True
