#!/bin/bash
# After the deadline gate (r4_post_run_v2) finishes, snapshot the newest
# flagship milestone to a COMMITTED bf16 npz (tools/warmstart.py) so the
# round-4 model survives a VM restore (gitignored orbax dirs do not —
# the 08:08 incident). Host-side only; does not touch the chip.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "\[r4_post_v2\] gate recorded" "$LOG"; do sleep 120; done
# post_v2 relaunches the extension right after the gate; snapshotting the
# pre-extension milestone now is correct (newer ones land every 2k steps,
# re-run manually for a fresher snapshot before round end if desired)
python tools/warmstart.py snapshot >> "$LOG" 2>&1
echo "[snapshot_watcher] warmstart rc=$? $(date)" >> "$LOG"
if [ -f results/long_run/warmstart.npz ]; then
  git add -f results/long_run/warmstart.npz
  # pathspec'd commit: this watcher fires asynchronously and must never
  # sweep in whatever else happens to be staged at that moment
  git commit -q -m "Warm-start snapshot of the round-4 flagship milestone (VM-restore insurance)" \
    -- results/long_run/warmstart.npz \
    && echo "[snapshot_watcher] committed $(date)" >> "$LOG"
fi
