#!/bin/bash
# Self-perpetuating train->gate->extend loop (supersedes the one-shot
# tools/r4_post_100k.sh, which armed the current 160k extension).
#
# Each iteration: wait for the supervising watchdog to exit (step target
# reached, or it gave up), re-run the acceptance-gate protocol at the
# newest milestone (50k-sample proxy-FID/ISC/KID + Euler-vs-Heun steps
# probe + gate_verdict), then relaunch the watchdog with the target
# extended by STEP_INC on the reference 800k LR horizon (warm compile
# cache). Guard: if the newest milestone did not advance across an
# iteration, the previous segment made no progress (wedged relay, repeated
# stalls) — stop instead of spinning gate evals on the same checkpoint.
#
# Usage: setsid nohup bash tools/gate_loop.sh [STEP_INC=60000] &
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
INC="${1:-60000}"
echo "[gate_loop] armed inc=$INC $(date)" >> "$LOG"

wd_alive() {
  WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
  [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null
}

# STRICT filter (advisor r4): completed milestones only — the bare glob
# also matched orbax temp dirs and fed bogus strings downstream.
newest_ms() {
  ls -d results/long_run/model-* 2>/dev/null \
    | grep -E '/model-[0-9]+$' | sed 's/.*model-//' | sort -n | tail -1
}

LAST_GATED=0
while true; do
  while wd_alive; do sleep 120; done
  MS=$(newest_ms)
  case "$MS" in ''|*[!0-9]*)
    echo "[gate_loop] no milestone; stopping $(date)" >> "$LOG"; exit 1;;
  esac
  if [ "$MS" -le "$LAST_GATED" ]; then
    echo "[gate_loop] milestone $MS did not advance past $LAST_GATED; stopping $(date)" >> "$LOG"
    exit 1
  fi
  echo "[gate_loop] gating at milestone $MS $(date)" >> "$LOG"
  bash tools/wait_relay.sh
  timeout 7200 python tools/eval_fid.py 50000 >> "$LOG" 2>&1
  echo "[gate_loop] eval_fid rc=$? $(date)" >> "$LOG"
  bash tools/wait_relay.sh
  timeout 7200 python tools/sample_steps_probe.py "$MS" 1024 >> "$LOG" 2>&1
  echo "[gate_loop] steps_probe rc=$? milestone=$MS $(date)" >> "$LOG"
  # encoder-reuse re-read at the gated milestone (VERDICT r4 next #2:
  # the Heun/reuse levers were promised an on-chip re-read at >=160k)
  bash tools/wait_relay.sh
  timeout 7200 python tools/sample_reuse_probe.py "$MS" 1024 >> "$LOG" 2>&1
  echo "[gate_loop] reuse_probe rc=$? milestone=$MS $(date)" >> "$LOG"
  python tools/gate_verdict.py >> "$LOG" 2>&1
  echo "[gate_loop] gate recorded at milestone $MS $(date)" >> "$LOG"
  # AOT-compile the driver bench's programs into the committed XLA cache
  # while the chip is quiet (VERDICT r5 #1c) — seconds once warm.
  bash tools/wait_relay.sh
  timeout 3600 python tools/bench_prewarm.py >> "$LOG" 2>&1
  echo "[gate_loop] bench_prewarm rc=$? $(date)" >> "$LOG"
  # refresh the committed VM-restore insurance (host-side, no chip);
  # pathspec'd commit so an async fire never sweeps staged work. flock
  # serializes against snapshot_loop.sh's identical block (advisor r4).
  flock results/long_run/.gitcommit.lock bash -c '
    python tools/warmstart.py snapshot >> "'"$LOG"'" 2>&1 || exit 1
    [ -f results/long_run/warmstart.npz ] || exit 1
    git add -f results/long_run/warmstart.npz || { echo "[gate_loop] git add failed $(date)" >> "'"$LOG"'"; exit 1; }
    # the committed XLA cache + last bench result ride the same insurance
    # commit (content-addressed cache files dedup, so re-adds are free)
    git add -f results/xla_cache results/bench_last.json 2>/dev/null
    git commit -q -m "Warm-start snapshot refresh (VM-restore insurance)" \
      -- results/long_run/warmstart.npz results/xla_cache results/bench_last.json \
      && echo "[gate_loop] warmstart committed $(date)" >> "'"$LOG"'" \
      || echo "[gate_loop] warmstart commit failed $(date)" >> "'"$LOG"'"
  '
  LAST_GATED=$MS
  NEXT=$(( MS * 2000 + INC ))
  bash tools/wait_relay.sh
  ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py "$NEXT" \
    > "results/long_run/watchdog_to_${NEXT}.log" 2>&1 &
  sleep 30
  echo "[gate_loop] extension to $NEXT, watchdog pid $(cat results/long_run/watchdog.pid 2>/dev/null) $(date)" >> "$LOG"
done
