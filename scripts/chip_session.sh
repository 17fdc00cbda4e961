#!/bin/bash
# One-shot TPU measurement session: runs every chip-pending validation in
# sequence and logs to /tmp/chip_session.log. Run from /root/repo with the
# default (axon) platform when the tunnel is alive.
#
# Pending items this covers (BASELINE.md round-3 notes):
#   1. post-calibration dual-size bench (the recorded headline)
#   2. cross-backend golden pixel checks (fixed + wrist + incremental)
#   3. wide-vs-fine wrist compositor A/B at both scene sizes
#   4. fine-kernel pixel check vs the dense reference backend
#   5. fresh per-stage trace for BASELINE.md
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session.log
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  local out rc
  out=$(timeout 3600 "$@" 2>&1)
  rc=$?                       # the command's status, not a pipeline tail's
  echo "$out" | tail -20 | tee -a "$LOG"
  echo "--- rc=$rc ---" | tee -a "$LOG"
}

run python bench.py                                   # 1 (dual-size, calibrated)
run python bench.py --check                           # 2 (wide kernel checks)
run python bench.py --check --kernel fine             # 4 (fine vs dense)
run python bench.py --kernel fine --gaussians 30000   # 3a
run python bench.py --kernel fine --gaussians 99000   # 3b
run python -m real2sim_eval_tpu.experiments.utils.trace_step --batch 64  # 5
run python -m real2sim_eval_tpu.experiments.utils.trace_step --batch 64 --kernel fine
echo "chip session complete" | tee -a "$LOG"
