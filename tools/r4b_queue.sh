#!/bin/bash
# Round-4 resume queue after the VM reboot (08:08) that killed the
# followup chain mid relay-outage. Unlike r4_chip_followup.sh (which
# greps the log for rc=0 and so would re-run everything), this skips by
# RESULT ARTIFACT: sample_steps_probe already has milestone-26 data from
# its original quiet-chip run; vae_learn / cond_learn / eval_fid(isc,kid)
# never produced theirs. Exclusive chip: nothing else is running (the
# long run died with the VM). When done, appends the marker
# r4_relaunch.sh waits for and launches it to restart the long run on the
# reference 800k LR horizon toward 100k steps.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
echo "[r4b] resume queue after reboot $(date)" >> "$LOG"
run() {
  bash tools/wait_relay.sh
  echo "[r4b] START $* $(date)" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "[r4b] DONE rc=$? $* $(date)" >> "$LOG"
}
[ -f results/vae_learn/results.json ] || run python tools/vae_learn.py 2000
[ -f results/cond_learn/results.json ] || run python tools/cond_learn.py 3000
python - <<'EOF' || run python tools/eval_fid.py 50000
import json, sys
d = json.load(open("results/long_run/fid_eval.json"))
sys.exit(0 if "isc" in d else 1)
EOF
echo "[r4_followup] ALL DONE $(date)" >> "$LOG"
exec bash tools/r4_relaunch.sh
