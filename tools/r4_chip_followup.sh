#!/bin/bash
# Round-4 retry chain: the 20:05-23:40 axon relay outage failed every
# main-queue item at backend init. Wait for the relay to return
# (tools/wait_relay.sh), then run each item that never recorded rc=0,
# re-checking the relay between items. Exclusive chip: the trainer is
# stopped until tools/r4_relaunch.sh fires after our ALL DONE marker.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
echo "[r4_followup] waiting for axon relay :8083 $(date)" >> "$LOG"
run() {
  bash tools/wait_relay.sh
  echo "[r4_followup] START $* $(date)" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "[r4_followup] DONE rc=$? $* $(date)" >> "$LOG"
}
grep -q "DONE rc=0 python tools/sample_steps_probe.py" "$LOG" || \
  run python tools/sample_steps_probe.py 26 1024
grep -q "DONE rc=0 python tools/vae_learn.py" "$LOG" || \
  run python tools/vae_learn.py 2000
grep -q "DONE rc=0 python tools/cond_learn.py" "$LOG" || \
  run python tools/cond_learn.py 3000
grep -q "DONE rc=0 python tools/eval_fid.py" "$LOG" || \
  run python tools/eval_fid.py 50000
echo "[r4_followup] ALL DONE $(date)" >> "$LOG"
