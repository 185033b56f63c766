"""Stall watchdog: detects a hung child via stale heartbeat, kills it, and
relaunches resuming from the newest milestone (VERDICT r2 item 7)."""

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from watchdog import newest_milestone, run_watched  # noqa: E402

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
        return [sys.executable, str(script), str(tmp_path), str(resume)]

    rc = run_watched(
        make_cmd, tmp_path,
        timeout=1.0, poll=0.2, grace=5.0, max_restarts=3,
        log=logs.append,
    )
    assert rc == 0
    assert (tmp_path / "done").read_text() == "resumed-from-1"
    assert any("STALL" in l for l in logs)
    assert any("completed" in l for l in logs)


def test_run_watched_gives_up(tmp_path):
    script = tmp_path / "crash.py"
    script.write_text("import sys; sys.exit(3)\n")

    def make_cmd(resume):
        return [sys.executable, str(script)]

    logs = []
    rc = run_watched(
        make_cmd, tmp_path,
        timeout=1.0, poll=0.1, grace=2.0, max_restarts=2, log=logs.append,
    )
    assert rc == 1
    assert any("giving up" in l for l in logs)
