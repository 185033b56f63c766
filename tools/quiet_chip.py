"""Run a command with the long-run trainer quiesced (quiet chip).

Pause protocol shared with bench.py (VERDICT r3 weak #2, hardened round 4):
the trainer's REAL pid comes from results/long_run/run.pid and is verified
to be a python running train_long.py before any signal (stale pid files
must not touch an unrelated process). Two cases, decided by whether the
trainer has heartbeated SINCE ITS OWN LAUNCH (steady state):

- STEADY: SIGSTOP for the duration, SIGCONT after; the heartbeat is kept
  fresh while paused so pre-fix watchdogs never judge the paused trainer
  stalled (tools/watchdog.py treats the 'T' state as paused). Measured
  safe: round-3 benches coexisted with a steady-state trainer.

- MID-COMPILE (launched, no heartbeat yet): pausing would freeze its
  in-flight remote-compile RPC and the axon compile service then refuses
  new clients ("TPU backend setup/compile error (Unavailable)" after
  ~25 min) — two queue items died this way on 2026-08-17
  (results/r4_queue.log 22:23, 22:48) while the freshly-relaunched
  trainer was inside its ~31-min train-step compile. So instead: freeze
  the supervising watchdog (the trainer's parent, found via PPid and
  verified by cmdline), KILL the trainer group, run the command on a free
  chip, then SIGCONT the watchdog — it sees the child gone and relaunches
  from the newest milestone (run_watched counts one restart).

Usage: python tools/quiet_chip.py CMD [ARGS...]
Exit code is the wrapped command's.
"""

from __future__ import annotations

import contextlib
import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DEFAULT_RESULTS = REPO / "results/long_run"


def _trainer_pid(results_dir: Path) -> int | None:
    try:
        cand = int((results_dir / "run.pid").read_text().strip())
        cmdline = Path(f"/proc/{cand}/cmdline").read_bytes().decode()
        if "train_long.py" in cmdline and "python" in cmdline:
            return cand
    except (OSError, ValueError):
        pass
    return None


def _proc_start_epoch(pid: int) -> float:
    """Absolute start time of pid: /proc/stat btime + starttime ticks."""
    stat = Path(f"/proc/{pid}/stat").read_text()
    # field 22 (starttime) counted AFTER the ')' that ends the comm field,
    # which may itself contain spaces/parens
    ticks = int(stat.rsplit(")", 1)[1].split()[19])
    with open("/proc/stat") as f:
        btime = next(
            int(line.split()[1]) for line in f if line.startswith("btime")
        )
    return btime + ticks / os.sysconf("SC_CLK_TCK")


def _is_steady(pid: int, results_dir: Path) -> bool:
    """True iff the trainer has written a heartbeat since ITS OWN launch.

    train_long writes no heartbeat until its warmup step completes, so a
    heartbeat older than the process start means mid-backend-init or
    mid-compile — the state in which a SIGSTOP poisons the compile
    service (module docstring). Unreadable /proc ⇒ not steady (be safe).
    """
    try:
        hb_mtime = (results_dir / "heartbeat").stat().st_mtime
        return hb_mtime >= _proc_start_epoch(pid)
    except OSError:
        return False


def _watchdog_pid(trainer_pid: int) -> int | None:
    """The supervising watchdog = trainer's parent, verified by cmdline.

    NEVER returns the calling process: if the trainer's parent is us
    (e.g. a test spawning a fake trainer from a process whose argv
    happens to mention watchdog.py — pytest running test_watchdog.py
    froze ITSELF this way), freezing it would deadlock the quiesce."""
    try:
        status = Path(f"/proc/{trainer_pid}/status").read_text()
        ppid = int(status.split("PPid:")[1].split()[0])
        if ppid in (0, 1, os.getpid()):
            return None
        if b"watchdog.py" in Path(f"/proc/{ppid}/cmdline").read_bytes():
            return ppid
    except (OSError, ValueError, IndexError):
        pass
    return None


def _signal_trainer(pid: int, sig: int) -> None:
    """Signal the trainer's whole group when that is safe.

    Group-signal only when the trainer leads its own group (watchdog
    launches it with start_new_session) and that group is not OURS —
    a stale/odd setup must never killpg the calling bench/test process.
    """
    try:
        pg = os.getpgid(pid)
        if pg == pid and pg != os.getpgrp():
            os.killpg(pg, sig)
            return
    except (ProcessLookupError, PermissionError, OSError):
        pass
    try:
        os.kill(pid, sig)
    except OSError:
        pass


def _exited(pid: int) -> bool:
    """Gone OR zombie — a frozen watchdog cannot reap its killed child,
    so the trainer lingers as 'Z' holding no chip resources."""
    try:
        stat = Path(f"/proc/{pid}/stat").read_text()
        return stat.rsplit(")", 1)[1].split()[0] == "Z"
    except OSError:
        return True


def _kill_group(pid: int, log) -> None:
    _signal_trainer(pid, signal.SIGTERM)
    for _ in range(20):  # up to 10 s for a clean exit
        if _exited(pid):
            return
        time.sleep(0.5)
    log(f"[quiet_chip] SIGKILL trainer pid {pid} (did not exit on TERM)")
    _signal_trainer(pid, signal.SIGKILL)


@contextlib.contextmanager
def quiesce(results_dir: Path | None = None, log=None):
    """Context manager: quiet chip inside the block (see module docstring)."""
    results_dir = Path(
        results_dir
        or os.environ.get("ADM_TPU_QUIET_RESULTS")  # tests point elsewhere
        or DEFAULT_RESULTS
    )
    if log is None:
        log = lambda msg: print(msg, file=sys.stderr, flush=True)
    pid = _trainer_pid(results_dir)
    if pid is None:
        yield
        return

    if not _is_steady(pid, results_dir):
        # mid-compile: freeze the watchdog so it cannot relaunch a fresh
        # (immediately-compiling) trainer under us, then kill the trainer
        wd = _watchdog_pid(pid)
        if wd is not None:
            os.kill(wd, signal.SIGSTOP)
            log(f"[quiet_chip] froze watchdog pid {wd}")
        log(f"[quiet_chip] trainer pid {pid} is MID-COMPILE — killing "
            "(watchdog resumes it from the newest milestone)")
        _kill_group(pid, log)
        try:
            yield
        finally:
            if wd is not None:
                try:
                    os.kill(wd, signal.SIGCONT)
                    log(f"[quiet_chip] thawed watchdog pid {wd}")
                except OSError:
                    pass
        return

    # steady state: pause/resume, keeping the heartbeat fresh while paused
    stop = threading.Event()

    def _keepalive():
        hb = results_dir / "heartbeat"
        while not stop.wait(60.0):
            try:
                os.utime(hb)
            except OSError:
                pass

    os.kill(pid, signal.SIGSTOP)
    log(f"[quiet_chip] paused trainer pid {pid}")
    threading.Thread(target=_keepalive, daemon=True).start()
    try:
        yield
    finally:
        stop.set()
        try:
            os.kill(pid, signal.SIGCONT)
            log(f"[quiet_chip] resumed trainer pid {pid}")
        except OSError:
            pass


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    # `timeout N python tools/quiet_chip.py …` SIGTERMs US, not the wrapped
    # command. Python's default TERM handler would exit without unwinding —
    # leaving the trainer SIGSTOP'd (or the watchdog frozen) forever and
    # the wrapped chip command orphaned (code-review r4). Convert TERM/INT
    # into an exception so quiesce()'s finally runs IMMEDIATELY, and TERM
    # the child's whole process group so the chip is actually freed. No
    # wait() in the handler: the interrupted main thread holds Popen's
    # waitpid lock, so a handler-side wait can never reap and would only
    # stall the unwind (code-review r4 round 2).
    proc: subprocess.Popen | None = None

    def _on_signal(signum, frame):
        if proc is not None and proc.poll() is None:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
            except (ProcessLookupError, PermissionError, OSError):
                proc.terminate()
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    with quiesce():
        proc = subprocess.Popen(sys.argv[1:], start_new_session=True)
        return proc.wait()


if __name__ == "__main__":
    sys.exit(main())
