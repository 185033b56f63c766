#!/bin/bash
# Follow-up chip tasks after tools/r4_chip_queue.sh drains: retry the queue
# items that died at axon backend init (UNAVAILABLE) while the paused
# trainer's in-flight compile wedged the shared remote-compile service.
# The watchdog+trainer are STOPPED for the queue's duration now (they get
# relaunched with the 800k LR horizon by tools/r4_relaunch.sh right after
# this emits its ALL DONE marker), so retries run on an exclusive chip —
# no quiet_chip wrapper needed.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "\[r4_queue\] ALL DONE" "$LOG"; do sleep 120; done
run() {
  echo "[r4_followup] START $* $(date)" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "[r4_followup] DONE rc=$? $* $(date)" >> "$LOG"
}
# retry anything the main queue recorded as failed
grep -q "DONE rc=0 python tools/sample_steps_probe.py" "$LOG" || \
  run python tools/sample_steps_probe.py 26 1024
grep -q "DONE rc=0 python tools/vae_learn.py" "$LOG" || \
  run python tools/vae_learn.py 2000
grep -q "DONE rc=0 python tools/cond_learn.py" "$LOG" || \
  run python tools/cond_learn.py 3000
grep -q "DONE rc=0 python tools/eval_fid.py" "$LOG" || \
  run python tools/eval_fid.py 50000
echo "[r4_followup] ALL DONE $(date)" >> "$LOG"
