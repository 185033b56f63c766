"""bench.py survivability contract (VERDICT r4 #1).

The round-4 driver bench record was rc=124 with parsed:null — the bench
was SIGKILLed mid-compile with an empty stdout. These tests pin the three
degradation layers that make that impossible now:

  1. a fresh partial result wins and is flagged bench_deadline_hit;
  2. with nothing fresh, the last completed run is emitted marked stale;
  3. with no history at all, an explicit null-value line still parses.

Plus the end-to-end path: a subprocess whose deadline fires mid-"compile"
exits 0 having printed a parseable JSON line.

No TPU, no jax — bench.py defers all heavy imports into build_programs().
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import bench


def _with_last_good(tmp_path, monkeypatch, payload):
    p = tmp_path / "bench_last.json"
    if payload is not None:
        p.write_text(json.dumps(payload))
    monkeypatch.setattr(bench, "LAST_GOOD", p)
    return p


def test_fresh_partial_wins(tmp_path, monkeypatch):
    _with_last_good(tmp_path, monkeypatch, {"metric": "x", "value": 1.0})
    monkeypatch.setattr(bench, "_best", {"metric": "fresh", "value": 499.0})
    out = bench._deadline_result()
    assert out["metric"] == "fresh" and out["value"] == 499.0
    assert out["bench_deadline_hit"] is True
    assert "stale" not in out


def test_stale_fallback(tmp_path, monkeypatch):
    _with_last_good(
        tmp_path, monkeypatch,
        {"metric": "cifar10_train_imgs_per_sec_per_chip", "value": 402.22,
         "measured_at": "2026-08-17"})
    monkeypatch.setattr(bench, "_best", None)
    out = bench._deadline_result()
    assert out["value"] == 402.22
    assert out["stale"] is True
    assert "2026-08-17" in out["stale_reason"]


def test_placeholder_last_good_is_not_emitted(tmp_path, monkeypatch):
    # the supervision loops seed an empty {} before the first real run;
    # that must degrade to the explicit-error line, not an empty dict
    _with_last_good(tmp_path, monkeypatch, {})
    monkeypatch.setattr(bench, "_best", None)
    out = bench._deadline_result()
    assert out["value"] is None and "error" in out


def test_no_history(tmp_path, monkeypatch):
    _with_last_good(tmp_path, monkeypatch, None)
    monkeypatch.setattr(bench, "_best", None)
    out = bench._deadline_result()
    assert out["metric"] == "cifar10_train_imgs_per_sec_per_chip"
    assert out["value"] is None and "error" in out


def test_deadline_fires_end_to_end(tmp_path):
    """A bench whose measurement hangs past the budget exits 0 with a
    parseable JSON line on stdout (the exact r4 failure, survived)."""
    last = tmp_path / "bench_last.json"
    last.write_text(json.dumps(
        {"metric": "cifar10_train_imgs_per_sec_per_chip", "value": 402.22,
         "unit": "imgs/sec/chip", "measured_at": "driver BENCH_r03"}))
    code = f"""
import threading, time
import bench
bench.LAST_GOOD = __import__('pathlib').Path({str(last)!r})
threading.Thread(target=bench._deadline_guard, args=(0.3,), daemon=True).start()
time.sleep(30)  # the hung "compile"; the guard must os._exit first
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=20, cwd=Path(bench.__file__).parent)
    assert proc.returncode == 0
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed["value"] == 402.22 and parsed["stale"] is True


def test_record_final_writes_last_good(tmp_path, monkeypatch, capsys):
    p = _with_last_good(tmp_path, monkeypatch, None)
    monkeypatch.setattr(bench, "_best", None)
    bench._record({"metric": "m", "value": 5.0}, final=True)
    saved = json.loads(p.read_text())
    assert saved["value"] == 5.0 and "measured_at" in saved
    printed = json.loads(capsys.readouterr().out.strip())
    assert printed == {"metric": "m", "value": 5.0}


def test_startup_insurance_line(tmp_path, monkeypatch, capsys):
    """An instant SIGKILL (external driver timeout shorter than backend
    init) must still leave a parseable stale line in the output tail —
    emitted before any device work, superseded by every later line."""
    _with_last_good(
        tmp_path, monkeypatch,
        {"metric": "cifar10_train_imgs_per_sec_per_chip", "value": 412.95,
         "measured_at": "2026-08-19T22:58:40Z"})
    bench._startup_insurance_line()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 412.95 and out["stale"] is True
    assert "superseded" in out["stale_reason"]
    assert "2026-08-19" in out["stale_reason"]


def test_startup_insurance_silent_without_history(tmp_path, monkeypatch, capsys):
    # placeholder {} or missing file → print NOTHING at startup (an
    # explicit null line here would shadow nothing and confuse a tail
    # parser if the bench is killed before the deadline guard arms)
    _with_last_good(tmp_path, monkeypatch, {})
    bench._startup_insurance_line()
    assert capsys.readouterr().out == ""
    _with_last_good(tmp_path, monkeypatch, None)
    bench._startup_insurance_line()
    assert capsys.readouterr().out == ""
