"""Quiet-chip quiesce protocol (tools/quiet_chip.py, shared with bench.py).

Covers the round-4 hardening: a STEADY trainer (heartbeat since launch)
is SIGSTOP'd and resumed; a MID-COMPILE one (no heartbeat this launch)
is KILLED — pausing it would wedge the axon compile service (measured
2026-08-17, results/r4_queue.log 22:23/22:48) — with its supervising
watchdog frozen for the window so it cannot relaunch a fresh
immediately-compiling trainer under the bench.

Fakes spawn with `python -S` (skips the ~10 s sitecustomize/jax import
tax on this box, same as tests/test_watchdog.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from quiet_chip import _proc_start_epoch, _trainer_pid, quiesce  # noqa: E402

TRAINER_SRC = "import time\ntime.sleep(300)\n"

WATCHDOG_SRC = """\
import subprocess, sys, time
from pathlib import Path
d = Path(sys.argv[1])
child = subprocess.Popen(
    [sys.executable, "-S", str(d / "train_long.py")], start_new_session=True
)
(d / "run.pid").write_text(str(child.pid))
child.wait()
(d / "relaunched").write_text("1")
time.sleep(300)
"""


def _state(pid: int) -> str:
    try:
        stat = Path(f"/proc/{pid}/stat").read_text()
        return stat.rsplit(")", 1)[1].split()[0]
    except OSError:
        return "X"


def _spawn_trainer(results: Path) -> subprocess.Popen:
    script = results / "train_long.py"
    script.write_text(TRAINER_SRC)
    proc = subprocess.Popen(
        [sys.executable, "-S", str(script)], start_new_session=True
    )
    (results / "run.pid").write_text(str(proc.pid))
    # wait for the exec: until then /proc/<pid>/cmdline is still the
    # parent's argv and _trainer_pid refuses to touch the process
    deadline = time.time() + 10
    while _trainer_pid(results) is None and time.time() < deadline:
        time.sleep(0.05)
    assert _trainer_pid(results) == proc.pid
    return proc


def test_proc_start_epoch_is_now(tmp_path):
    proc = _spawn_trainer(tmp_path)
    try:
        assert abs(_proc_start_epoch(proc.pid) - time.time()) < 30.0
    finally:
        proc.kill()
        proc.wait()


def test_steady_trainer_is_paused_and_resumed(tmp_path):
    proc = _spawn_trainer(tmp_path)
    try:
        time.sleep(0.2)
        (tmp_path / "heartbeat").touch()  # heartbeat AFTER launch = steady
        logs = []
        with quiesce(tmp_path, log=logs.append):
            deadline = time.time() + 5
            while _state(proc.pid) != "T" and time.time() < deadline:
                time.sleep(0.05)
            assert _state(proc.pid) == "T", logs
        deadline = time.time() + 5
        while _state(proc.pid) == "T" and time.time() < deadline:
            time.sleep(0.05)
        assert _state(proc.pid) in ("S", "R"), logs
        assert any("paused" in m for m in logs)
        assert any("resumed" in m for m in logs)
    finally:
        proc.kill()
        proc.wait()


def test_midcompile_trainer_is_killed_not_paused(tmp_path):
    # no heartbeat file at all -> launched but never heartbeated
    proc = _spawn_trainer(tmp_path)
    try:
        logs = []
        with quiesce(tmp_path, log=logs.append):
            assert proc.poll() is not None or _state(proc.pid) == "Z", logs
        assert any("MID-COMPILE" in m for m in logs)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()


def test_stale_heartbeat_from_previous_launch_counts_as_midcompile(tmp_path):
    (tmp_path / "heartbeat").touch()
    time.sleep(1.1)  # heartbeat mtime strictly BEFORE the launch below
    proc = _spawn_trainer(tmp_path)
    try:
        logs = []
        with quiesce(tmp_path, log=logs.append):
            assert proc.poll() is not None or _state(proc.pid) == "Z", logs
        assert any("MID-COMPILE" in m for m in logs)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()


def test_midcompile_freezes_watchdog_until_after_the_window(tmp_path):
    script = tmp_path / "watchdog.py"
    script.write_text(WATCHDOG_SRC)
    (tmp_path / "train_long.py").write_text(TRAINER_SRC)
    wd = subprocess.Popen(
        [sys.executable, "-S", str(script), str(tmp_path)],
        start_new_session=True,
    )
    try:
        deadline = time.time() + 30
        pid_file = tmp_path / "run.pid"
        while _trainer_pid(tmp_path) is None and time.time() < deadline:
            time.sleep(0.1)
        assert pid_file.exists(), "fake watchdog never launched the trainer"
        trainer_pid = _trainer_pid(tmp_path)
        assert trainer_pid is not None

        logs = []
        with quiesce(tmp_path, log=logs.append):
            # trainer dead (zombie until the frozen watchdog reaps it),
            # watchdog frozen, so no relaunch inside the window
            deadline = time.time() + 10
            while _state(trainer_pid) not in ("Z", "X") and \
                    time.time() < deadline:
                time.sleep(0.1)
            assert _state(trainer_pid) in ("Z", "X"), logs
            # SIGSTOP is sent before the trainer kill, but the group-stop
            # transition needs the target scheduled once — under a loaded
            # box the one-shot read raced it ('R'), same flaky-by-margin
            # class as the r3 watchdog test. Bounded wait, then assert.
            deadline = time.time() + 10
            while _state(wd.pid) != "T" and time.time() < deadline:
                time.sleep(0.1)
            assert _state(wd.pid) == "T", logs
            assert not (tmp_path / "relaunched").exists()
        # thawed watchdog reaps the child and "relaunches"
        deadline = time.time() + 10
        while not (tmp_path / "relaunched").exists() and time.time() < deadline:
            time.sleep(0.1)
        assert (tmp_path / "relaunched").exists(), logs
        assert any("froze watchdog" in m for m in logs), logs
        assert any("thawed watchdog" in m for m in logs), logs
    finally:
        if wd.poll() is None:
            wd.kill()
        wd.wait()


def test_no_trainer_is_a_noop(tmp_path):
    logs = []
    with quiesce(tmp_path, log=logs.append):
        pass
    assert logs == []


def test_sigterm_mid_window_resumes_trainer_and_kills_child(tmp_path):
    """`timeout N quiet_chip.py …` SIGTERMs the quiescer, not the wrapped
    command — the trainer must still get SIGCONT and the wrapped child
    must not be orphaned (code-review r4 finding)."""
    import signal as _signal

    trainer = _spawn_trainer(tmp_path)
    try:
        time.sleep(0.2)
        (tmp_path / "heartbeat").touch()  # steady -> SIGSTOP path
        qc_script = Path(__file__).resolve().parent.parent / "tools/quiet_chip.py"
        env = dict(os.environ, ADM_TPU_QUIET_RESULTS=str(tmp_path))
        qc = subprocess.Popen(
            [sys.executable, "-S", str(qc_script),
             sys.executable, "-S", "-c", "import time; time.sleep(300)"],
            env=env,
        )
        # wait until the trainer is actually paused (window is open)
        deadline = time.time() + 20
        while _state(trainer.pid) != "T" and time.time() < deadline:
            time.sleep(0.1)
        assert _state(trainer.pid) == "T"
        wrapped = _wrapped_child_of(qc.pid)
        qc.send_signal(_signal.SIGTERM)
        assert qc.wait(timeout=30) == 128 + _signal.SIGTERM
        # trainer resumed, wrapped child gone
        deadline = time.time() + 10
        while _state(trainer.pid) == "T" and time.time() < deadline:
            time.sleep(0.1)
        assert _state(trainer.pid) in ("S", "R")
        if wrapped is not None:
            deadline = time.time() + 10
            while _state(wrapped) not in ("Z", "X") and time.time() < deadline:
                time.sleep(0.1)
            assert _state(wrapped) in ("Z", "X")
    finally:
        trainer.kill()
        trainer.wait()


def _wrapped_child_of(pid: int) -> int | None:
    """First child of pid (via /proc children), None if not yet spawned."""
    try:
        for task in Path(f"/proc/{pid}/task").iterdir():
            kids = (task / "children").read_text().split()
            if kids:
                return int(kids[0])
    except (OSError, ValueError):
        pass
    return None
