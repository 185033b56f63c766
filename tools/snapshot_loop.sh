#!/bin/bash
# Periodic warm-start insurance (supplements the per-gate snapshot in
# tools/gate_loop.sh, whose 60k-step cadence let the 2026-08-19 03:44 VM
# restore cost 28k steps). Every INTERVAL seconds: if the newest flagship
# milestone advanced since the last snapshot, rewrite warmstart.npz
# (tools/warmstart.py, host-side CPU — never touches the chip) and commit
# it pathspec'd. Bounds the worst-case loss on a VM restore to one
# interval of training.
#
# Usage: setsid nohup bash tools/snapshot_loop.sh [INTERVAL=5400] &
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
INTERVAL="${1:-5400}"
GITLOCK=results/long_run/.gitcommit.lock
echo "[snapshot_loop] armed interval=${INTERVAL}s $(date)" >> "$LOG"

# STRICT filter (advisor r4, medium): completed milestones only. The bare
# model-* glob also matched orbax temp dirs (model-N.orbax-checkpoint-tmp-*),
# which poisoned the advancement guard with non-integer strings.
newest_ms() {
  ls -d results/long_run/model-* 2>/dev/null \
    | grep -E '/model-[0-9]+$' | sed 's/.*model-//' | sort -n | tail -1
}

LAST=0
while true; do
  sleep "$INTERVAL"
  MS=$(newest_ms)
  case "$MS" in ''|*[!0-9]*) continue;; esac
  [ "$MS" -le "$LAST" ] && continue
  # flock serializes against gate_loop.sh's snapshot+commit block: two
  # concurrent warmstart.py writers or git commits would race (advisor r4)
  flock "$GITLOCK" bash -c '
    python tools/warmstart.py snapshot >> "'"$LOG"'" 2>&1 || exit 1
    [ -f results/long_run/warmstart.npz ] || exit 1
    git add -f results/long_run/warmstart.npz || { echo "[snapshot_loop] git add failed $(date)" >> "'"$LOG"'"; exit 1; }
    # the committed XLA cache + last bench result ride along (dedup = free)
    git add -f results/xla_cache results/bench_last.json 2>/dev/null
    # pathspec'"'"'d commit: fires asynchronously, must never sweep staged work
    git commit -q -m "Warm-start snapshot refresh (periodic VM-restore insurance, milestone '"$MS"')" \
      -- results/long_run/warmstart.npz results/xla_cache results/bench_last.json \
      && echo "[snapshot_loop] committed milestone '"$MS"' $(date)" >> "'"$LOG"'" \
      || echo "[snapshot_loop] commit failed (empty or index race) $(date)" >> "'"$LOG"'"
  ' && LAST=$MS
done
