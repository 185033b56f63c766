"""Throughput regression pin (VERDICT r4 next #6).

Round 4's 413 img/s sustained rate had no guard keeping it from rotting
silently. This slow-tier test runs the REAL sustained-loop benchmark
(tools/bench_train_loop.py) on the axon chip — a subprocess, so the
conftest's CPU forcing doesn't apply — under the shared quiet-chip
protocol, and asserts the sustained rate stays >= 400 img/s.

Skips (never fails) when the machine can't measure: no axon plugin, the
loopback relay is down, or another probe holds the chip.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
PIN_IMGS_PER_SEC = 400.0


def _relay_up() -> bool:
    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=5):
            return True
    except OSError:
        return False


def _measure_once() -> float:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools/quiet_chip.py"),
         sys.executable, str(REPO / "tools/bench_train_loop.py"), "220"],
        capture_output=True, text=True, timeout=2400, cwd=str(REPO))
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert proc.returncode == 0 and lines, (
        f"bench_train_loop failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-500:]}\nstderr tail: {proc.stderr[-800:]}")
    return json.loads(lines[-1])["imgs_per_sec_sustained"]


@pytest.mark.slow
def test_sustained_throughput_pin():
    if not Path("/root/.axon_site/axon").exists():
        pytest.skip("no axon TPU plugin on this machine")
    if not _relay_up():
        pytest.skip("axon relay :8083 down — cannot measure")
    rate = _measure_once()
    if rate < PIN_IMGS_PER_SEC:
        # the host loop is dispatch-sensitive: a loaded box can shave a few
        # percent (measured 2026-08-19: fail then 400+ on immediate rerun).
        # One retry separates transient load from a real regression.
        rate = max(rate, _measure_once())
    assert rate >= PIN_IMGS_PER_SEC, (
        f"sustained flagship throughput regressed: {rate} < "
        f"{PIN_IMGS_PER_SEC} img/s on two consecutive runs (round-4 "
        "measured 413.8; investigate before lowering this pin)")
