#!/bin/bash
# After the round-4 gate sequence finishes, measure encoder-propagation
# sampling (tools/sample_reuse_probe.py) at the final milestone on the
# freed chip. Separate watcher so the already-running r4_post_run.sh is
# not edited mid-execution (bash lazy-reads scripts).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
until grep -q "\[r4_post_run\] all done" "$LOG"; do sleep 120; done
bash tools/wait_relay.sh
echo "[r4_reuse] START sample_reuse_probe $(date)" >> "$LOG"
timeout 7200 python tools/sample_reuse_probe.py >> "$LOG" 2>&1
echo "[r4_reuse] DONE rc=$? $(date)" >> "$LOG"
