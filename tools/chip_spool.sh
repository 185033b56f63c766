#!/bin/bash
# Spool-based one-chip task runner. Tasks are numbered .task files in
# results/chip_spool/, each containing one shell command. Runs them in
# lexical order; when the spool is empty, execs the long-run watchdog so the
# chip never idles. Drop new .task files any time BEFORE the watchdog takes
# over (check results/r3_queue.log).
set -u
cd "$(dirname "$0")/.."
SPOOL=results/chip_spool
STEPS="${1:-100000}"
while true; do
  task=$(ls "$SPOOL"/*.task 2>/dev/null | head -1)
  if [ -z "$task" ]; then break; fi
  echo "[spool] run $task $(date)" >> results/r3_queue.log
  bash "$task" >> results/r3_queue.log 2>&1
  echo "[spool] done $task rc=$? $(date)" >> results/r3_queue.log
  mv "$task" "$task.done"
done
echo "[spool] empty -> watchdog $STEPS $(date)" >> results/r3_queue.log
exec python tools/watchdog.py "$STEPS" >> results/r3_queue.log 2>&1
