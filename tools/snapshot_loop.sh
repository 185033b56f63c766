#!/bin/bash
# Periodic warm-start insurance (supplements the per-gate snapshot in
# tools/gate_loop.sh, whose 60k-step cadence let the 2026-08-19 03:44 VM
# restore cost 28k steps). Every INTERVAL seconds: if the newest flagship
# milestone advanced since the last snapshot, rewrite warmstart.npz
# (tools/warmstart.py, host-side CPU — never touches the chip) and commit
# it pathspec'd. Bounds the worst-case loss on a VM restore to one
# interval of training.
#
# Usage: setsid nohup bash tools/snapshot_loop.sh [INTERVAL=1800] &
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
INTERVAL="${1:-1800}"
echo "[snapshot_loop] armed interval=${INTERVAL}s $(date)" >> "$LOG"

newest_ms() {
  ls -d results/long_run/model-* 2>/dev/null | sed 's/.*model-//' | sort -n | tail -1
}

LAST=0
while true; do
  sleep "$INTERVAL"
  MS=$(newest_ms)
  [ -z "$MS" ] && continue
  [ "$MS" -le "$LAST" ] && continue
  python tools/warmstart.py snapshot >> "$LOG" 2>&1 || continue
  if [ -f results/long_run/warmstart.npz ]; then
    git add -f results/long_run/warmstart.npz
    # pathspec'd commit: fires asynchronously, must never sweep staged work
    git commit -q -m "Warm-start snapshot refresh (periodic VM-restore insurance, milestone $MS)" \
      -- results/long_run/warmstart.npz \
      && echo "[snapshot_loop] committed milestone $MS $(date)" >> "$LOG"
    LAST=$MS
  fi
done
