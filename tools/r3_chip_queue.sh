#!/bin/bash
# Round-3 chip queue: serialize the one-chip experiments, then hand the chip
# to the long-run watchdog for the rest of the round.
#   1. wait for the running celeb_onchip probe (pid file /tmp/celeb.pid)
#   2. tools/pad_probe.py        (PERF_r3 channel_round experiment)
#   3. tools/cond_onchip.py      (DUTS sliding-window smoke)
#   4. tools/eval_fid.py 50000   (protocol-scale proxy-FID loop on-chip)
#   5. tools/watchdog.py $STEPS  (long-run training, unattended)
set -u
cd "$(dirname "$0")/.."
STEPS="${1:-100000}"

if [ -f /tmp/celeb.pid ]; then
  pid=$(cat /tmp/celeb.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
echo "[queue] celeb probe done $(date)" >> results/r3_queue.log

timeout 5400 python tools/pad_probe.py >> results/r3_queue.log 2>&1
echo "[queue] pad_probe rc=$? $(date)" >> results/r3_queue.log

timeout 5400 python tools/cond_onchip.py >> results/r3_queue.log 2>&1
echo "[queue] cond_onchip rc=$? $(date)" >> results/r3_queue.log

timeout 7200 python tools/eval_fid.py 50000 >> results/r3_queue.log 2>&1
echo "[queue] eval_fid rc=$? $(date)" >> results/r3_queue.log

echo "[queue] launching watchdog $STEPS $(date)" >> results/r3_queue.log
exec python tools/watchdog.py "$STEPS" >> results/r3_queue.log 2>&1
