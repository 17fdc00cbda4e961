#!/bin/bash
# Round-5b TPU measurement session: the remainder of the round-5 chip
# queue after the SDF-extrapolation physics fix (54ff2d3) and the
# fine-kernel SMEM/env-chunk fixes (90f3c3a) landed. Run from /root/repo
# with the default (axon) platform, AFTER the default `python bench.py`
# headline run has finished (one chip — don't share it).
#
# Unlike chip_session.sh, every item logs its FULL output to its own
# file under /tmp (the tail -25 of the first session lost the trace
# stage tables).
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/r5b_summary.log
: > "$SUMMARY"
run() {
  local name=$1; shift
  local log=/tmp/r5b_${name}.log
  echo "=== $name: $* ===" | tee -a "$SUMMARY"
  timeout 4800 "$@" > "$log" 2>&1
  local rc=$?
  tail -6 "$log" | tee -a "$SUMMARY"
  echo "--- $name rc=$rc (full log: $log) ---" | tee -a "$SUMMARY"
}

# 1. re-bank chip correctness + NEW steady-state per-iteration timings
#    (83d2da9) for every kernel family, post-SDF-extrapolation physics
run smoke python scripts/chip_smoke.py \
    --note "round-5b: steady-state timings, SDF-extrapolated physics"

# 2. record the missing fine goldens (cross-backend --check for these
#    combos passed in session 1; the earlier --write-golden crash was the
#    SMEM prefetch overflow fixed in 90f3c3a)
run golden_fine python bench.py --write-golden --kernel fine
run golden_wfine python bench.py --write-golden --wrist-kernel fine \
    --gaussians 99000

# 3. wide-vs-fine flagship A/B (each cell asserts its own golden)
run ab_fine python bench.py --kernel fine
run ab_wfine python bench.py --wrist-kernel fine --gaussians 99000

# 4. full traces at the headline scene (sort-based merge), stage tables
#    captured whole this time
run trace_headline python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000
run trace_physics python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000 --what physics
run trace_precull_off python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000 --what render --precull off

echo "r5b chip session complete" | tee -a "$SUMMARY"
