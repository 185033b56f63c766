#!/bin/bash
# End-of-round chip sequence: waits for the long-run watchdog to exit
# (training reached its step target, or it was killed), then runs the
# closing one-chip measurements while the chip is free:
#   1. tools/eval_fid.py 50000   protocol-scale proxy-FID at the final milestone
#   2. tools/sample_bs_probe.py  sampling-throughput batch sweep (PERF_r3)
#   3. bench.py                  headline sanity record -> results/bench_r3_local.json
# Usage: bash tools/post_run.sh <watchdog_pid>
set -u
cd "$(dirname "$0")/.."
WPID="${1:?watchdog pid}"
LOG=results/r3_queue.log
while kill -0 "$WPID" 2>/dev/null; do sleep 30; done
echo "[post_run] watchdog $WPID exited, chip free $(date)" >> "$LOG"

timeout 7200 python tools/eval_fid.py 50000 >> "$LOG" 2>&1
echo "[post_run] eval_fid rc=$? $(date)" >> "$LOG"

timeout 5400 python tools/sample_bs_probe.py >> "$LOG" 2>&1
echo "[post_run] sample_bs_probe rc=$? $(date)" >> "$LOG"

timeout 3600 python bench.py > results/bench_r3_local.json 2>> "$LOG"
echo "[post_run] bench rc=$? $(date)" >> "$LOG"
echo "[post_run] all done $(date)" >> "$LOG"
