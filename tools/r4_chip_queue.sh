#!/bin/bash
# Round-4 one-chip task queue: learning-evidence runs + protocol eval, each
# with the long-run trainer SIGSTOP'd (tools/quiet_chip.py) so every number
# comes from a quiet chip (VERDICT r3 weak #2). Sequential on purpose — one
# v5e. Logs to results/r4_queue.log.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_queue.log
run() {
  echo "[r4_queue] START $* $(date)" >> "$LOG"
  timeout 7200 python tools/quiet_chip.py "$@" >> "$LOG" 2>&1
  echo "[r4_queue] DONE rc=$? $* $(date)" >> "$LOG"
}
# 1. finish the sampler-discretization probe (det50 + stoch10; det10/25 cached)
run python tools/sample_steps_probe.py 26 1024
# 2. VAE GAN learning evidence (VERDICT r3 item 4a)
run python tools/vae_learn.py 2000
# 3. conditional-family learning evidence (VERDICT r3 item 4b)
run python tools/cond_learn.py 3000
# 4. protocol-scale FID+ISC+KID, 50k samples (VERDICT r3 item 7)
run python tools/eval_fid.py 50000
echo "[r4_queue] ALL DONE $(date)" >> "$LOG"
