#!/bin/bash
# Follow-up chip tasks after tools/r4_chip_queue.sh drains: retry the
# sampler-steps probe (its first run died at axon backend init --
# transient tunnel UNAVAILABLE, results/r4_queue.log 22:23). Waits for
# the ALL DONE marker, then reuses the same quiet-chip run protocol.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "ALL DONE" "$LOG"; do sleep 120; done
run() {
  echo "[r4_followup] START $* $(date)" >> "$LOG"
  timeout 7200 python tools/quiet_chip.py "$@" >> "$LOG" 2>&1
  echo "[r4_followup] DONE rc=$? $* $(date)" >> "$LOG"
}
run python tools/sample_steps_probe.py 26 1024
echo "[r4_followup] ALL DONE $(date)" >> "$LOG"
