#!/bin/bash
# One-shot TPU measurement session: runs every chip-pending validation in
# sequence and logs to /tmp/chip_session.log. Run from /root/repo with the
# default (axon) platform when the tunnel is alive.
#
# Round-4 sequence (VERDICT round-3 "next round" items 1/3/4/5):
#   1. post-calibration dual-size bench (the recorded headline)
#   2. wide-vs-fine wrist-family A/B at the headline scene
#   3. full-fine A/B at both scene sizes
#   4. fresh per-stage traces at the HEADLINE scene (dense LBS object),
#      incl. a precull off/auto A/B
#   5. fine-kernel cross-backend check (vs the dense reference)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session.log
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  local out rc
  out=$(timeout 3600 "$@" 2>&1)
  rc=$?                       # the command's status, not a pipeline tail's
  echo "$out" | tail -25 | tee -a "$LOG"
  echo "--- rc=$rc ---" | tee -a "$LOG"
}

run python bench.py                                      # 1 (dual-size, calibrated)
run python bench.py --wrist-kernel fine --gaussians 99000   # 2
run python bench.py --kernel fine --gaussians 99000      # 3a (no-golden exit ok)
run python bench.py --kernel fine --gaussians 30000      # 3b
run python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000       # 4 (headline trace)
run python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000 --precull off
run python bench.py --check --kernel fine                # 5
echo "chip session complete" | tee -a "$LOG"
