#!/bin/bash
# One-shot TPU measurement session: runs every chip-pending validation in
# sequence and logs to /tmp/chip_session.log. Run from /root/repo with the
# default (axon) platform when the tunnel is alive.
#
# Round-5 sequence (VERDICT round-4 "next round" items 1/3/4/5; advisor
# round-4 item 4: goldens are RECORDED before any A/B that asserts them,
# so no legitimate sweep exits with a spurious vs_baseline=0.0):
#   1. cross-backend checks of the sort-based merge (wide, fine, and the
#      wide+wrist-fine combination — each validates the exact pipeline a
#      later throughput run uses)
#   2. golden recording for the kernel combinations that have none yet
#      (fine at both sizes; wide+wrist-fine at the headline scene)
#   3. the recorded headline: default dual-size bench (wide), pixel +
#      saturation gated
#   4. wide-vs-fine flagship A/B (full-fine dual-size; wrist-fine at the
#      headline scene) — every cell pixel-asserted against its own golden
#   5. fresh per-stage traces at the headline scene (sort-based merge),
#      incl. a precull off/auto A/B and a physics/mimic attribution trace
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

# --- 0. re-bank CHIP_LOG correctness evidence for the rewritten merge ----
run python scripts/chip_smoke.py --items incr_wide,incr_fine \
    --note "round-5 sort-based merge"

# --- 1. cross-backend pixel checks (compile-heavy; caches warm the rest) --
run python bench.py --check                              # wide
run python bench.py --check --kernel fine                # fine
# wrist-fine combo validated at the default-size scene (the dense
# REFERENCE comparator at 130k would dominate the session; the kernel
# composition is scene-size-independent and the 99k throughput run
# asserts its own golden)
run python bench.py --check --wrist-kernel fine

# --- 2. record missing goldens (sanctioned: each combo checked above) ----
run python bench.py --write-golden --kernel fine         # fine, both sizes
run python bench.py --write-golden --wrist-kernel fine --gaussians 99000

# --- 3. the recorded headline (wide, dual-size, gated) -------------------
run python bench.py

# --- 4. wide-vs-fine flagship A/B ----------------------------------------
run python bench.py --kernel fine                        # fine, both sizes
run python bench.py --wrist-kernel fine --gaussians 99000

# --- 5. traces at the headline scene --------------------------------------
run python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000
run python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000 --precull off
run python -m real2sim_eval_tpu.experiments.utils.trace_step \
    --batch 64 --gaussians 99000 --obj-dense 30000 --what physics
echo "chip session complete" | tee -a "$LOG"
