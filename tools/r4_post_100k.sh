#!/bin/bash
# Post-100k gate sequence (round 4, follows tools/r4_post_run_v3.sh).
#
# The v3 sequence gated at the 68k milestone and armed an extension
# watchdog to step 100k. This script waits for that watchdog to exit on
# its own (run complete), re-runs the acceptance gate at the newest
# milestone (protocol-scale 50k-sample proxy-FID + ISC/KID), re-reads
# the Euler-vs-Heun steps probe at the better-trained milestone (the
# BASELINE Heun verdict says to re-read it at every later milestone),
# records the gate verdict, then resumes training toward 160k on the
# same 800k LR horizon (compile already cached).
#
# Usage: bash tools/r4_post_100k.sh   (run under setsid nohup)
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
echo "[r4_100k] armed $(date)" >> "$LOG"

wd_alive() {
  WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
  [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null
}

while wd_alive; do sleep 60; done
echo "[r4_100k] watchdog exited $(date)" >> "$LOG"

FINAL_MS=$(ls -d results/long_run/model-* 2>/dev/null | sed 's/.*model-//' | sort -n | tail -1)
if [ -z "$FINAL_MS" ]; then
  echo "[r4_100k] ERROR: no milestone checkpoint; skipping gate $(date)" >> "$LOG"
  exit 1
fi
bash tools/wait_relay.sh
timeout 7200 python tools/eval_fid.py 50000 >> "$LOG" 2>&1
echo "[r4_100k] eval_fid rc=$? $(date)" >> "$LOG"
bash tools/wait_relay.sh
timeout 7200 python tools/sample_steps_probe.py "$FINAL_MS" 1024 >> "$LOG" 2>&1
echo "[r4_100k] steps_probe rc=$? milestone=$FINAL_MS $(date)" >> "$LOG"
python tools/gate_verdict.py >> "$LOG" 2>&1
echo "[r4_100k] gate recorded $(date)" >> "$LOG"

# Resume toward 160k for whatever wall-clock remains. Same 800k horizon
# -> train-step compile comes from the on-disk cache. The driver bench
# quiesces a live trainer itself (tools/quiet_chip.py).
bash tools/wait_relay.sh
ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py 160000 \
  > results/long_run/watchdog_r4ext2.log 2>&1 &
sleep 30
echo "[r4_100k] extension watchdog pid $(cat results/long_run/watchdog.pid 2>/dev/null) $(date)" >> "$LOG"
echo "[r4_100k] all done $(date)" >> "$LOG"
