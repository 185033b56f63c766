"""Stall watchdog: detects a hung child via stale heartbeat, kills it, and
relaunches resuming from the newest milestone (VERDICT r2 item 7).

All fake trainers spawn with `python -S`: on this box a plain interpreter
start runs sitecustomize -> axon.register -> full jax import (~4-10 s,
VERDICT r3 weak #1), which could eat the whole grace window and kill the
child before its first heartbeat. -S skips site init; the fakes are
stdlib-only. Grace is also sized >= 60 s so a loaded box can't starve the
child of its first heartbeat.
"""

import os
import signal
import sys
import textwrap
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import watchdog as wd  # noqa: E402
from watchdog import (  # noqa: E402
    bootstrap_from_warmstart,
    newest_milestone,
    run_watched,
)

# Fake trainer: first launch (no milestone yet) heartbeats, saves model-1,
# then hangs forever — simulating the axon futex-sleep stall. The resumed
# launch sees model-1 and completes.
CHILD = textwrap.dedent("""
    import sys, time
    from pathlib import Path
    out = Path(sys.argv[1]); resume = int(sys.argv[2])
    hb = out / "heartbeat"
    if resume >= 1:
        hb.write_text("resumed")
        (out / "done").write_text(f"resumed-from-{resume}")
        sys.exit(0)
    for _ in range(3):
        hb.write_text("alive"); time.sleep(0.05)
    (out / "model-1").mkdir()
    time.sleep(3600)  # stall: no more heartbeats
""")

# Fake trainer for the SIGSTOP-pause test: heartbeats briefly, writes its
# pid, then runs WITHOUT heartbeating long enough that a bench-style pause
# would push the heartbeat age past `timeout` — then heartbeats and exits 0.
PAUSE_CHILD = textwrap.dedent("""
    import sys, time
    from pathlib import Path
    out = Path(sys.argv[1])
    hb = out / "heartbeat"
    hb.write_text("alive")
    (out / "child.pid").write_text(str(__import__("os").getpid()))
    time.sleep(5.5)   # paused ~4 s of this by the test (SIGSTOP)
    hb.write_text("alive-again")
    (out / "done").write_text("completed")
    sys.exit(0)
""")


def test_newest_milestone(tmp_path):
    assert newest_milestone(tmp_path) == 0
    (tmp_path / "model-3").mkdir()
    (tmp_path / "model-12").mkdir()
    (tmp_path / "model-x").mkdir()
    assert newest_milestone(tmp_path) == 12


def test_run_watched_kills_stalled_child_and_resumes(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    logs = []

    def make_cmd(resume):
        return [sys.executable, "-S", str(script), str(tmp_path), str(resume)]

    rc = run_watched(
        make_cmd, tmp_path,
        timeout=1.0, poll=0.2, grace=60.0, max_restarts=3,
        log=logs.append,
    )
    assert rc == 0
    assert (tmp_path / "done").read_text() == "resumed-from-1"
    assert any("STALL" in l for l in logs)
    assert any("completed" in l for l in logs)


def test_bootstrap_noop_paths(tmp_path, monkeypatch):
    """No snapshot -> 0; an existing milestone wins without any restore
    subprocess (the heavy path is exercised by tests/test_warmstart.py
    and was driven on the real flagship milestone)."""

    def _boom(*a, **k):
        raise AssertionError("restore subprocess must not run")

    monkeypatch.setattr(wd.subprocess, "run", _boom)
    assert bootstrap_from_warmstart(tmp_path, log=lambda *_: None) == 0
    (tmp_path / "model-4").mkdir()
    (tmp_path / "warmstart.npz").write_bytes(b"not-a-real-npz")
    assert bootstrap_from_warmstart(tmp_path, log=lambda *_: None) == 4


def test_bootstrap_invokes_restore_when_only_snapshot_exists(
        tmp_path, monkeypatch):
    (tmp_path / "warmstart.npz").write_bytes(b"payload")
    calls = []

    class _RC:
        returncode = 0

    def fake_run(cmd, **kw):
        calls.append(cmd)
        (tmp_path / "model-7").mkdir()  # what a real restore produces
        return _RC()

    monkeypatch.setattr(wd.subprocess, "run", fake_run)
    got = bootstrap_from_warmstart(tmp_path, log=lambda *_: None)
    assert got == 7
    assert calls and calls[0][1].endswith("warmstart.py")
    assert calls[0][2:] == ["restore", str(tmp_path)]


def test_run_watched_bootstraps_when_no_milestone(tmp_path):
    """VM-restore recovery wiring: with no model-N on disk, run_watched
    must consult the bootstrap hook and launch at ITS milestone."""
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent("""
        import sys
        from pathlib import Path
        out = Path(sys.argv[1])
        (out / "heartbeat").write_text("alive")
        (out / "done").write_text(f"started-at-{sys.argv[2]}")
        sys.exit(0)
    """))

    def bootstrap():
        (tmp_path / "model-6").mkdir()  # snapshot rebuilt a milestone
        return 6

    def make_cmd(resume):
        return [sys.executable, "-S", str(script), str(tmp_path), str(resume)]

    rc = run_watched(
        make_cmd, tmp_path,
        timeout=5.0, poll=0.1, grace=60.0, max_restarts=1,
        bootstrap=bootstrap, log=lambda *_: None,
    )
    assert rc == 0
    assert (tmp_path / "done").read_text() == "started-at-6"


def test_run_watched_gives_up(tmp_path):
    script = tmp_path / "crash.py"
    script.write_text("import sys; sys.exit(3)\n")

    def make_cmd(resume):
        return [sys.executable, "-S", str(script)]

    logs = []
    rc = run_watched(
        make_cmd, tmp_path,
        timeout=1.0, poll=0.1, grace=60.0, max_restarts=2, log=logs.append,
    )
    assert rc == 1
    assert any("giving up" in l for l in logs)


def test_run_watched_tolerates_sigstop_pause(tmp_path):
    """bench.py SIGSTOPs the trainer to quiesce the chip (VERDICT r3 item 2):
    the watchdog must see state 'T' as paused, not stalled, and must not
    kill over the heartbeat age accrued while paused."""
    script = tmp_path / "pause_child.py"
    script.write_text(PAUSE_CHILD)
    logs = []
    pid_file = tmp_path / "child.pid"

    def pauser():
        deadline = time.time() + 30
        while not pid_file.exists():
            if time.time() > deadline:
                return
            time.sleep(0.05)
        pid = int(pid_file.read_text())
        time.sleep(0.5)
        os.kill(pid, signal.SIGSTOP)  # heartbeat now ages past timeout
        time.sleep(4.0)
        os.kill(pid, signal.SIGCONT)

    t = threading.Thread(target=pauser)
    t.start()

    def make_cmd(resume):
        return [sys.executable, "-S", str(script), str(tmp_path)]

    # timeout 3 < the 4 s pause: without 'T'-state tolerance the watchdog
    # would kill the paused child and loop to max_restarts. The child's
    # UNPAUSED no-heartbeat stretch is ~1.5 s, well under timeout.
    rc = run_watched(
        make_cmd, tmp_path,
        timeout=3.0, poll=0.2, grace=60.0, max_restarts=1, log=logs.append,
    )
    t.join()
    assert rc == 0
    assert (tmp_path / "done").read_text() == "completed"
    assert not any("STALL" in l for l in logs)


def test_run_watched_bounds_an_orphaned_pause(tmp_path):
    """A quiescer that dies without SIGCONT must not disable stall
    recovery forever (code-review r4): past max_pause the watchdog
    resumes the child itself and goes back to heartbeat aging."""
    script = tmp_path / "pause_child.py"
    script.write_text(PAUSE_CHILD)
    logs = []
    pid_file = tmp_path / "child.pid"

    def orphaned_pauser():
        deadline = time.time() + 30
        while not pid_file.exists():
            if time.time() > deadline:
                return
            time.sleep(0.05)
        os.kill(int(pid_file.read_text()), signal.SIGSTOP)
        # no SIGCONT — the "quiescer" is gone

    t = threading.Thread(target=orphaned_pauser)
    t.start()

    def make_cmd(resume):
        return [sys.executable, "-S", str(script), str(tmp_path)]

    rc = run_watched(
        make_cmd, tmp_path,
        timeout=30.0, poll=0.2, grace=60.0, max_restarts=1,
        max_pause=1.0, keepalive_fresh=1.0, log=logs.append,
    )
    t.join()
    assert rc == 0
    assert (tmp_path / "done").read_text() == "completed"
    assert any("pause exceeded" in l for l in logs)


def test_run_watched_never_resumes_under_a_live_quiescer(tmp_path):
    """A LIVE quiescer (keepalive touching the heartbeat every 60s, like
    quiet_chip) must keep the pause forgiven past max_pause — force-resume
    under a still-running chip job would make two programs contend."""
    script = tmp_path / "pause_child.py"
    script.write_text(PAUSE_CHILD)
    logs = []
    pid_file = tmp_path / "child.pid"
    stop = threading.Event()

    def live_quiescer():
        deadline = time.time() + 30
        while not pid_file.exists():
            if time.time() > deadline:
                return
            time.sleep(0.05)
        pid = int(pid_file.read_text())
        os.kill(pid, signal.SIGSTOP)
        hb = tmp_path / "heartbeat"
        t_end = time.time() + 3.0  # hold the pause well past max_pause=1
        while time.time() < t_end:
            hb.touch()  # keepalive
            time.sleep(0.2)
        os.kill(pid, signal.SIGCONT)
        stop.set()

    t = threading.Thread(target=live_quiescer)
    t.start()

    def make_cmd(resume):
        return [sys.executable, "-S", str(script), str(tmp_path)]

    rc = run_watched(
        make_cmd, tmp_path,
        timeout=30.0, poll=0.2, grace=60.0, max_restarts=1,
        max_pause=1.0, keepalive_fresh=1.0, log=logs.append,
    )
    t.join()
    assert rc == 0
    assert (tmp_path / "done").read_text() == "completed"
    assert not any("pause exceeded" in l for l in logs), logs
