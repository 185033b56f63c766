#!/bin/bash
# Round-5 chip queue: once the backend outage ends and the trainer is
# STEADY (heartbeat fresh for >=15 min AND the training log advanced),
# run the XLA-flags probe + bench prewarm, then commit the warmed cache.
# Each quiesce window is bounded; if the probe fails again on backend
# init, log and retry up to MAX_TRIES with an hour between attempts.
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_probe.log
MAX_TRIES="${1:-3}"
echo "[r5_queue] armed $(date)" >> "$LOG"

hb_age() {
  local m
  m=$(stat -c %Y results/long_run/heartbeat 2>/dev/null || echo 0)
  echo $(( $(date +%s) - m ))
}

last_step() {
  tail -1 results/long_run/training_log.csv 2>/dev/null | cut -d, -f1
}

wait_steady() {
  # fresh heartbeat + step advancement across a 15-min window
  while true; do
    while [ "$(hb_age)" -gt 120 ]; do sleep 120; done
    S0=$(last_step); sleep 900
    S1=$(last_step)
    if [ "$(hb_age)" -le 120 ] && [ -n "$S1" ] && [ "$S1" != "$S0" ]; then
      return 0
    fi
  done
}

TRY=0
while [ "$TRY" -lt "$MAX_TRIES" ]; do
  TRY=$((TRY+1))
  echo "[r5_queue] waiting for steady trainer (try $TRY) $(date)" >> "$LOG"
  wait_steady
  echo "[r5_queue] trainer steady; probing $(date)" >> "$LOG"
  # prewarm first: it is the driver-critical artifact (bench cache); the
  # flags probe is exploratory and pays the longer quiesce window
  timeout 3600 python tools/quiet_chip.py python tools/bench_prewarm.py >> "$LOG" 2>&1
  RC2=$?
  echo "[r5_queue] prewarm rc=$RC2 $(date)" >> "$LOG"
  timeout 9000 python tools/quiet_chip.py python tools/xla_flags_probe.py >> "$LOG" 2>&1
  RC1=$?
  echo "[r5_queue] xla_flags rc=$RC1 $(date)" >> "$LOG"
  if [ "$RC2" -eq 0 ]; then
    flock results/long_run/.gitcommit.lock bash -c '
      git add -f results/xla_cache results/bench_last.json PERF_r5.jsonl 2>/dev/null
      git commit -q -m "Warmed XLA cache + r5 perf probe artifacts" \
        -- results/xla_cache results/bench_last.json PERF_r5.jsonl \
        && echo "[r5_queue] cache committed $(date)" >> "'"$LOG"'" \
        || echo "[r5_queue] cache commit empty/failed $(date)" >> "'"$LOG"'"
    '
    echo "[r5_queue] done $(date)" >> "$LOG"
    exit 0
  fi
  echo "[r5_queue] probe failed; backing off 3600s $(date)" >> "$LOG"
  sleep 3600
done
echo "[r5_queue] giving up after $MAX_TRIES tries $(date)" >> "$LOG"
