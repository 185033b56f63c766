"""Stall watchdog for unattended long runs (VERDICT r2 item 7).

The axon tunnel can drop an RPC mid-run: the training process then
futex-sleeps forever at 0% CPU while the device is healthy (CLAUDE.md).
Detection: the Trainer writes a `heartbeat` file at every log point; if it
goes stale past --timeout, the child is killed (SIGKILL, by its REAL pid —
we spawned it, no pgrep guessing) and relaunched resuming from the newest
orbax milestone in the results folder.

Usage:
  python tools/watchdog.py <steps>                # wraps tools/train_long.py
  python tools/watchdog.py <steps> --timeout 900 --grace 5400

A SIGSTOP'd child (bench.py pausing the trainer to quiesce the chip) is
recognized via /proc state 'T' and never counted as stalled.

If NO milestone exists at launch but results/warmstart.npz does (committed
by tools/r4_snapshot_watcher.sh), a milestone is first rebuilt from the
snapshot (tools/warmstart.py restore) — automatic recovery from the
VM-restore class of incident that wipes gitignored orbax dirs.

Library: run_watched() is generic over any (resume_milestone -> argv)
command factory; tests/test_watchdog.py drives it with a fake trainer.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path
from typing import Callable, List


def _proc_state(pid: int) -> str:
    """Single-char process state from /proc/<pid>/stat ('' if gone).

    'T' (SIGSTOP'd) matters: bench.py quiesces the chip by pausing the
    training pid, and a paused child must not be judged stalled."""
    try:
        stat = Path(f"/proc/{pid}/stat").read_text()
        # field 3, after the parenthesized comm (which may contain spaces)
        return stat.rsplit(")", 1)[1].split()[0]
    except (OSError, IndexError):
        return ""


def newest_milestone(results_dir: Path) -> int:
    """Largest N among results_dir/model-N orbax checkpoints (0 if none)."""
    best = 0
    if results_dir.is_dir():
        for d in results_dir.iterdir():
            m = re.fullmatch(r"model-(\d+)", d.name)
            if m and d.is_dir():
                best = max(best, int(m.group(1)))
    return best


def bootstrap_from_warmstart(results_dir: Path, log=print) -> int:
    """Disaster-recovery bootstrap (the 2026-08-18 08:08 VM restore class).

    A VM restore re-materialises the repo from git: gitignored orbax
    milestones (model-N/) vanish, but a COMMITTED results_dir/warmstart.npz
    (tools/warmstart.py snapshot, written by tools/r4_snapshot_watcher.sh)
    survives. When no milestone exists but the snapshot does, rebuild a
    milestone from it in a subprocess (host-side CPU; isolates the ~GB of
    restore temporaries from this long-lived supervisor).

    Returns the newest milestone now available (0 if nothing to restore).
    """
    ms = newest_milestone(results_dir)
    npz = results_dir / "warmstart.npz"
    marker = results_dir / ".warmstart_restore_failed"
    if ms or not npz.exists():
        return ms
    if marker.exists():
        # a deterministic failure (e.g. snapshot from a changed model
        # definition) must not re-burn minutes of CPU restore work before
        # every one of max_restarts relaunches
        log("[watchdog] warmstart restore previously failed "
            f"({marker}) — starting cold")
        return 0
    log(f"[watchdog] no orbax milestone but {npz} exists — "
        "rebuilding one from the warm-start snapshot")
    script = Path(__file__).resolve().parent / "warmstart.py"
    try:
        rc = subprocess.run(
            [sys.executable, str(script), "restore", str(results_dir)],
            timeout=1800,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -2  # the supervisor must survive a slow restore, not crash
    if rc != 0:
        marker.write_text(f"rc={rc}\n")
        log(f"[watchdog] warmstart restore failed rc={rc} — starting cold")
        return 0
    return newest_milestone(results_dir)


def _relay_up() -> bool:
    """True iff the axon loopback relay accepts connections (or there is
    no axon plugin at all — CPU boxes have no relay to wait for)."""
    import socket

    if not Path("/root/.axon_site/axon").exists():
        return True
    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=5):
            return True
    except OSError:
        return False


def run_watched(
    make_cmd: Callable[[int], List[str]],
    results_dir: Path,
    *,
    timeout: float = 900.0,
    poll: float = 10.0,
    grace: float = 1800.0,
    max_restarts: int = 20,
    max_pause: float = 7200.0,
    keepalive_fresh: float = 180.0,
    relay_wait: bool = False,
    bootstrap: Callable[[], int] | None = None,
    log=print,
) -> int:
    """Run make_cmd(resume_milestone) under stall supervision.

    grace: allowance before the FIRST heartbeat of each launch (backend init
    ~5 min + train-step compile can exceed 10 min on the tunneled backend).
    max_pause: longest tolerated SIGSTOP window with a STALE heartbeat. A
    quiescer that died without SIGCONT would otherwise disable stall
    recovery FOREVER (code-review r4) — past the cap the child is resumed
    and judged by heartbeat age as usual. A live quiescer keeps the
    heartbeat fresher than keepalive_fresh (quiet_chip touches it every
    60 s), so legitimate long quiesces are never force-resumed.
    Returns the final exit code (0 = child completed normally).
    """
    heartbeat = results_dir / "heartbeat"
    restarts = 0
    while True:
        if relay_wait:
            # the axon loopback relay can be down for hours; every launch
            # then burns ~25 min failing UNAVAILABLE at backend init —
            # 20 restarts would waste a whole day (measured outage
            # 2026-08-17 20:05-23:40). Poll the port instead; a waiting
            # launch costs nothing and resumes the moment the relay does.
            waited = 0.0
            while not _relay_up():
                if waited % 600 == 0:
                    log(f"[watchdog] axon relay :8083 down — waiting "
                        f"({waited / 60:.0f} min so far)")
                time.sleep(60.0)
                waited += 60.0
        resume = newest_milestone(results_dir)
        if resume == 0 and bootstrap is not None:
            # nothing on disk to resume from — maybe a committed warm-start
            # snapshot can rebuild a milestone (VM-restore recovery)
            resume = bootstrap()
        cmd = make_cmd(resume)
        launch_t = time.time()
        log(f"[watchdog] launch (resume={resume}): {' '.join(cmd)}")
        # new session: SIGKILL to the group catches helper threads/forks
        child = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        pause_slack = 0.0  # time observed in SIGSTOP 'T' state (bench quiesce)
        last_mtime = None
        while True:
            rc = child.poll()
            if rc is not None:
                break
            # a SIGSTOP'd child (bench.py quiescing the chip) is paused,
            # not stalled: accrue slack so the aged heartbeat is forgiven
            # after SIGCONT, until a fresh heartbeat resets it. Bounded:
            # past max_pause WITH a stale heartbeat the quiescer is
            # presumed dead — SIGCONT the child ourselves and fall through
            # to normal aging. A LIVE quiescer keeps the heartbeat fresh
            # while paused (quiet_chip's keepalive touches it every 60 s),
            # so a legitimate long quiesce is never force-resumed under a
            # still-running chip job (code-review r4).
            if _proc_state(child.pid) == "T":
                try:
                    hb_age = time.time() - heartbeat.stat().st_mtime
                except OSError:
                    hb_age = float("inf")
                if pause_slack < max_pause or hb_age < keepalive_fresh:
                    pause_slack += poll
                    time.sleep(poll)
                    continue
                log(f"[watchdog] pause exceeded {max_pause:.0f}s with a "
                    f"{hb_age:.0f}s-stale heartbeat — resuming pid "
                    f"{child.pid} (quiescer presumed dead)")
                try:
                    os.kill(child.pid, signal.SIGCONT)
                except OSError:
                    pass
            # stat ONCE — the file can vanish between two calls (results
            # dir cleanup), and the supervisor must never die of that
            try:
                mtime = heartbeat.stat().st_mtime
            except OSError:
                mtime = None
            if mtime is not None and mtime != last_mtime:
                last_mtime = mtime
                pause_slack = 0.0
            fresh = mtime is not None and mtime >= launch_t
            limit = (timeout if fresh else grace) + pause_slack
            ref_age = (
                time.time() - mtime if fresh else time.time() - launch_t
            )
            if ref_age > limit:
                log(f"[watchdog] STALL: heartbeat age {ref_age:.0f}s > "
                    f"{limit:.0f}s — killing pid {child.pid}")
                try:
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    child.kill()
                child.wait()
                stalled = True
                break
            time.sleep(poll)
        if not stalled:
            if rc == 0:
                log("[watchdog] child completed")
                return 0
            log(f"[watchdog] child exited rc={rc}")
        restarts += 1
        if restarts > max_restarts:
            log(f"[watchdog] giving up after {max_restarts} restarts")
            return 1
        time.sleep(2.0)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    timeout = 900.0
    if "--timeout" in sys.argv:
        timeout = float(sys.argv[sys.argv.index("--timeout") + 1])
    # grace default 5400 (ADVICE r3: one knob, one documented value):
    # backend init (~5 min) + cold compiles of the train step, samplers and
    # inception eval can stack past 30 min on the tunnel (measured: 31 min
    # for the 26k resume). run_watched's library default stays lower (1800)
    # for non-tunnel uses; this CLI always passes the long-run value.
    grace = 5400.0
    if "--grace" in sys.argv:
        grace = float(sys.argv[sys.argv.index("--grace") + 1])
    results = Path("results/long_run")
    results.mkdir(parents=True, exist_ok=True)
    # authoritative pidfile: `setsid nohup python … & echo $!` records the
    # setsid wrapper's pid when setsid forks (CLAUDE.md pitfall) — any
    # launcher-written value is overwritten here with the REAL watchdog pid
    # so `kill -0 $(cat watchdog.pid)` loops monitor the right process
    (results / "watchdog.pid").write_text(str(os.getpid()))
    here = Path(__file__).resolve().parent

    def make_cmd(resume: int) -> List[str]:
        return [sys.executable, str(here / "train_long.py"), str(steps),
                str(resume)]

    rc = run_watched(make_cmd, results, timeout=timeout, grace=grace,
                     relay_wait=True,
                     bootstrap=lambda: bootstrap_from_warmstart(results))
    summary = results / "summary.json"
    if summary.exists():
        print(json.dumps(json.loads(summary.read_text())))
    sys.exit(rc)


if __name__ == "__main__":
    main()
