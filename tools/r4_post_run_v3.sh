#!/bin/bash
# End-of-round-4 gate sequence, v3 (deadline-based; supersedes v2).
#
# v2 history: the 08:08 VM reboot wiped every orbax milestone so the
# relaunched run restarted from step 0 on the reference 800k horizon —
# it cannot reach its step target before the round ends. So: train until
# DEADLINE_UTC, stop the run cleanly, evaluate the acceptance gate at the
# newest milestone on the freed chip, and resume training for whatever
# wall-clock remains (the driver bench quiesces a live trainer itself via
# tools/quiet_chip.py).
#
# v3 adds the on-chip encoder-propagation probe (the one queued item of
# the round-4 sampling-acceleration work) in the free-chip window AFTER
# the gate verdict, bounded so it cannot collide with the driver's
# end-of-round bench (~20:05 UTC): start only before REUSE_CUTOFF, kill
# at REUSE_KILL. The probe checkpoints per-k into
# results/long_run/sample_reuse_probe.json, so a partial pass still
# lands k=1 (exact) and k=2.
#
# NOTE: logs keep the literal "[r4_post_v2]" tags — the already-running
# tools/r4_snapshot_watcher.sh greps for "[r4_post_v2] gate recorded".
#
# Usage: bash tools/r4_post_run_v3.sh [DEADLINE_HHMM_UTC=1815]
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
DEADLINE="${1:-1815}"
REUSE_CUTOFF=1900
REUSE_KILL_SECS=2700
echo "[r4_post_v2] v3 armed, deadline ${DEADLINE} UTC $(date)" >> "$LOG"

wd_alive() {
  WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
  [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null
}

while wd_alive && [ "$(date -u +%H%M)" -lt "$DEADLINE" ]; do sleep 60; done

if wd_alive; then
  echo "[r4_post_v2] deadline: stopping watchdog $WPID + trainer $(date)" >> "$LOG"
  kill "$WPID"; sleep 3; kill -9 "$WPID" 2>/dev/null
  TR_PID=$(cat results/long_run/run.pid 2>/dev/null || echo 0)
  if [ "$TR_PID" -gt 0 ] && grep -q train_long /proc/$TR_PID/cmdline 2>/dev/null; then
    kill -- -"$TR_PID" 2>/dev/null || kill "$TR_PID"
    sleep 10
    kill -9 -- -"$TR_PID" 2>/dev/null || kill -9 "$TR_PID" 2>/dev/null
  fi
  sleep 5
else
  echo "[r4_post_v2] watchdog exited on its own $(date)" >> "$LOG"
fi

# The relaunched run APPENDED its milestones to the archived run's trend
# (train_long loads quality_trend.json at startup; the old entries were
# already in memory when the file was archived+cleared). Keep only
# entries NOT present in the 58k archive so the gate reads this run.
python - <<'EOF'
import json
from pathlib import Path
live = Path("results/long_run/quality_trend.json")
arch = Path("results/long_run_58k/quality_trend.json")
if live.exists() and arch.exists():
    old = {json.dumps(e, sort_keys=True) for e in json.loads(arch.read_text())}
    kept = [e for e in json.loads(live.read_text())
            if json.dumps(e, sort_keys=True) not in old]
    live.write_text(json.dumps(kept, indent=1))
    print(f"[r4_post_v2] trend filtered to {len(kept)} fresh entries")
EOF

FINAL_MS=$(ls -d results/long_run/model-* 2>/dev/null | sed 's/.*model-//' | sort -n | tail -1)
if [ -z "$FINAL_MS" ]; then
  echo "[r4_post_v2] ERROR: no milestone checkpoint; skipping gate $(date)" >> "$LOG"
  exit 1
fi
bash tools/wait_relay.sh
timeout 7200 python tools/eval_fid.py 50000 >> "$LOG" 2>&1
echo "[r4_post_v2] eval_fid rc=$? $(date)" >> "$LOG"
bash tools/wait_relay.sh
timeout 7200 python tools/sample_steps_probe.py "$FINAL_MS" 1024 >> "$LOG" 2>&1
echo "[r4_post_v2] steps_probe rc=$? milestone=$FINAL_MS $(date)" >> "$LOG"
python tools/gate_verdict.py >> "$LOG" 2>&1
echo "[r4_post_v2] gate recorded $(date)" >> "$LOG"

# v3: encoder-propagation probe on the still-free chip, time-bounded
if [ "$(date -u +%H%M)" -lt "$REUSE_CUTOFF" ]; then
  bash tools/wait_relay.sh
  echo "[r4_reuse] START sample_reuse_probe milestone=$FINAL_MS $(date)" >> "$LOG"
  timeout "$REUSE_KILL_SECS" python tools/sample_reuse_probe.py "$FINAL_MS" 1024 >> "$LOG" 2>&1
  echo "[r4_reuse] DONE rc=$? $(date)" >> "$LOG"
else
  echo "[r4_reuse] SKIPPED (past ${REUSE_CUTOFF} UTC) $(date)" >> "$LOG"
fi

# Resume training for the remaining wall-clock (same 800k horizon ->
# the train-step compile is already in the on-disk cache from this
# segment). The driver's end-of-round bench quiesces a live trainer
# itself, so it is safe to leave running.
bash tools/wait_relay.sh
ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py 100000 \
  > results/long_run/watchdog_r4ext.log 2>&1 &
sleep 30
echo "[r4_post_v2] extension watchdog pid $(cat results/long_run/watchdog.pid 2>/dev/null) $(date)" >> "$LOG"
echo "[r4_post_v2] all done $(date)" >> "$LOG"
