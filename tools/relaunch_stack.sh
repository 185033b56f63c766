#!/bin/bash
# One-command post-VM-restore recovery (the procedure in CLAUDE.md
# "Round-5 operational changes", encapsulated after the fourth restore).
#
# A VM restore kills the setsid loops and usually wipes the orbax
# milestones; the committed warmstart.npz + results/xla_cache make the
# relaunch cheap (~12 min launch-to-stepping, measured 2026-08-21).
# This script: waits for the relay, relaunches the watchdog toward
# TARGET (it rebuilds a milestone from warmstart.npz if none exist),
# then re-arms gate_loop + snapshot_loop. Refuses to double-launch.
#
# Usage: bash tools/relaunch_stack.sh [TARGET=220000]
set -u
cd "$(dirname "$0")/.."
TARGET="${1:-220000}"

WPID=$(cat results/long_run/watchdog.pid 2>/dev/null || echo 0)
if [ "$WPID" -gt 0 ] && grep -q "watchdog\.py" /proc/$WPID/cmdline 2>/dev/null; then
  echo "watchdog already alive (pid $WPID) — nothing to do"; exit 0
fi

bash tools/wait_relay.sh

ADM_TPU_SCHED_TOTAL=800000 setsid nohup python tools/watchdog.py "$TARGET" \
  > "results/long_run/watchdog_to_${TARGET}_relaunch_$(date +%s).log" 2>&1 &
sleep 20
echo "watchdog pid $(cat results/long_run/watchdog.pid 2>/dev/null)"

loop_alive() {  # $1 = pidfile, $2 = script basename to match in cmdline
  P=$(cat "$1" 2>/dev/null || echo 0)
  [ "$P" -gt 0 ] && grep -q "$2" /proc/$P/cmdline 2>/dev/null
}
if ! loop_alive results/long_run/gate_loop.pid gate_loop.sh; then
  setsid nohup bash tools/gate_loop.sh > /dev/null 2>&1 &
  echo $! > results/long_run/gate_loop.pid
fi
if ! loop_alive results/long_run/snapshot_loop.pid snapshot_loop.sh; then
  setsid nohup bash tools/snapshot_loop.sh > /dev/null 2>&1 &
  echo $! > results/long_run/snapshot_loop.pid
fi
sleep 3
tail -2 results/r4_queue.log
echo "stack relaunched toward $TARGET"
