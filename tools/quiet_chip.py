"""Run a command with the long-run trainer SIGSTOP'd (quiet chip).

Same pause protocol as bench.py's quiesce_chip (VERDICT r3 weak #2): the
trainer's REAL pid comes from results/long_run/run.pid, is verified to be a
python running train_long.py, is SIGSTOP'd for the duration of the wrapped
command, and the heartbeat is kept fresh while paused so pre-fix watchdogs
never judge the paused trainer stalled (tools/watchdog.py treats the 'T'
state as paused). No jax import — safe to exec instantly.

Usage: python tools/quiet_chip.py CMD [ARGS...]
Exit code is the wrapped command's.

CAVEAT (measured, round 4): only pause a trainer that is in STEADY STATE.
Pausing one mid-compile freezes its in-flight remote-compile RPC and the
axon compile service then refuses new clients ("TPU backend setup/compile
error (Unavailable)" after ~25 min) — two queue items died this way on
2026-08-17 (results/r4_queue.log 22:23, 22:48) while the freshly-relaunched
trainer was inside its ~31-min train-step compile. In round 3 the bench
coexisted fine with a steady-state trainer. If the trainer hasn't
heartbeated past its launch grace yet, stop it entirely instead of pausing.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PID_FILE = REPO / "results/long_run/run.pid"


def _trainer_pid() -> int | None:
    try:
        cand = int(PID_FILE.read_text().strip())
        cmdline = Path(f"/proc/{cand}/cmdline").read_bytes().decode()
        if "train_long.py" in cmdline and "python" in cmdline:
            return cand
    except (OSError, ValueError):
        pass
    return None


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    pid = _trainer_pid()
    stop = threading.Event()

    def _keepalive():
        hb = PID_FILE.parent / "heartbeat"
        while not stop.wait(60.0):
            try:
                os.utime(hb)
            except OSError:
                pass

    if pid is not None:
        os.kill(pid, signal.SIGSTOP)
        print(f"[quiet_chip] paused trainer pid {pid}", file=sys.stderr,
              flush=True)
        threading.Thread(target=_keepalive, daemon=True).start()
    try:
        rc = subprocess.call(sys.argv[1:])
    finally:
        if pid is not None:
            stop.set()
            try:
                os.kill(pid, signal.SIGCONT)
                print(f"[quiet_chip] resumed trainer pid {pid}",
                      file=sys.stderr, flush=True)
            except OSError:
                pass
    return rc


if __name__ == "__main__":
    sys.exit(main())
