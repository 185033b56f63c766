#!/bin/bash
# End-of-round-4 gate sequence: wait for the relaunched (800k-horizon)
# watchdog run to finish its 100k-step target, then evaluate the
# acceptance gate at the final milestone on the freed chip:
#   1. tools/eval_fid.py 50000       protocol-scale pass at the newest milestone
#   2. tools/sample_steps_probe.py   det10/25 discretization at the final milestone
#   3. tools/gate_verdict.py         pass/fail on the anchor-calibrated scale
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "\[r4_relaunch\] watchdog pid" "$LOG"; do sleep 120; done
# watchdog.pid is written by watchdog.py itself (authoritative); verify it
# is a live watchdog before monitoring — a bogus pid would fall through
# instantly and run the chip-heavy gate against a still-training chip
WPID=0
for _ in $(seq 60); do
  WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
  if [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null; then
    break
  fi
  WPID=0; sleep 5
done
if [ "$WPID" -eq 0 ]; then
  echo "[r4_post_run] ERROR: no live watchdog pid; aborting gate $(date)" >> "$LOG"
  exit 1
fi
while kill -0 "$WPID" 2>/dev/null; do sleep 60; done
# a SIGKILLed watchdog can leave its trainer running — wait for it too
TR_PID=$(cat results/long_run/run.pid 2>/dev/null || echo 0)
while [ "$TR_PID" -gt 0 ] && grep -q train_long /proc/$TR_PID/cmdline 2>/dev/null; do
  sleep 60
done
echo "[r4_post_run] watchdog $WPID exited, chip free $(date)" >> "$LOG"

FINAL_MS=$(ls -d results/long_run/model-* 2>/dev/null | sed 's/.*model-//' | sort -n | tail -1)
# the relay can be down for hours (CLAUDE.md) — probe before EACH chip
# item so a mid-sequence outage doesn't burn 25-min UNAVAILABLE inits
bash tools/wait_relay.sh
timeout 7200 python tools/eval_fid.py 50000 >> "$LOG" 2>&1
echo "[r4_post_run] eval_fid rc=$? $(date)" >> "$LOG"
# archive the milestone-26 probe before probing the final milestone
# (the probe resumes from a partial JSON, so it must start clean)
if [ -f results/long_run/sample_steps_probe.json ]; then
  mv results/long_run/sample_steps_probe.json \
     results/long_run/sample_steps_probe_m26.json
fi
bash tools/wait_relay.sh
timeout 7200 python tools/sample_steps_probe.py "$FINAL_MS" 1024 >> "$LOG" 2>&1
echo "[r4_post_run] steps_probe rc=$? milestone=$FINAL_MS $(date)" >> "$LOG"
python tools/gate_verdict.py >> "$LOG" 2>&1
echo "[r4_post_run] gate recorded $(date)" >> "$LOG"

# Gate judged at 100k — now give round 5 the best model the remaining
# wall-clock can buy: resume training toward 160k on the SAME 800k
# horizon (same env -> the train-step compile is already cached from the
# 58k->100k segment). The driver's end-of-round bench quiesces the
# trainer itself (tools/quiet_chip.py via bench.py), so a live run is
# safe to leave behind.
bash tools/wait_relay.sh
ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py 160000 \
  > results/long_run/watchdog_r4ext.log 2>&1 &
sleep 30
echo "[r4_post_run] extension watchdog pid $(cat results/long_run/watchdog.pid 2>/dev/null) $(date)" >> "$LOG"
echo "[r4_post_run] all done $(date)" >> "$LOG"
