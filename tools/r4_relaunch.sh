#!/bin/bash
# After the round-4 chip queue + followup drain: restart the long run with
# the REFERENCE LR-schedule horizon (ADM_TPU_SCHED_TOTAL=800000, matching
# train_uncond_dpm.py's train_num_steps-horizon poly decay, power 0.96).
# Round-3 set a 100k horizon to avoid resume re-stretching; at 58k that
# had decayed lr to 4.4e-5 and the proxy-FID trend plateaued (~44k on).
# The twin harness proves the dynamics match torch exactly, so the horizon
# deviation is the top plateau suspect: restore the reference schedule
# (lr back to ~9.3e-5 at 58k) and let the run continue toward 100k.
# Also picks up the live steady-state run stats (trainer.py, r4).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "\[r4_followup\] ALL DONE" "$LOG"; do sleep 120; done
WD_PID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
if [ "$WD_PID" -gt 0 ] && grep -q watchdog /proc/$WD_PID/cmdline 2>/dev/null; then
  kill "$WD_PID"; sleep 2
fi
TR_PID=$(cat results/long_run/run.pid 2>/dev/null || echo 0)
if [ "$TR_PID" -gt 0 ] && grep -q train_long /proc/$TR_PID/cmdline 2>/dev/null; then
  kill "$TR_PID"; sleep 5
  kill -9 "$TR_PID" 2>/dev/null
fi
echo "[r4_relaunch] horizon 100k->800000 (reference protocol), relaunching watchdog $(date)" >> "$LOG"
ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py 100000 \
  > results/long_run/watchdog_r4.log 2>&1 &
# watchdog.py writes its OWN pid to watchdog.pid at startup ($! here can be
# the setsid wrapper, CLAUDE.md pitfall). Wait for the real pid to appear
# (python startup ~10s on this box) before announcing it.
for _ in $(seq 60); do
  sleep 5
  WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
  if [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null; then
    echo "[r4_relaunch] watchdog pid $WPID $(date)" >> "$LOG"
    exit 0
  fi
done
echo "[r4_relaunch] ERROR: watchdog never wrote a live pid $(date)" >> "$LOG"
exit 1
