#!/usr/bin/env bash
# Launch wrapper mirroring the reference's
# experiments/scripts/replay/rope.sh (exact task/policy configuration,
# incl. any per-task overrides). TPU device selection is implicit
# (one jax process per host); use eval_policy_parallel for batched
# multi-env evaluation instead of process-per-GPU fan-out.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m real2sim_eval_tpu.experiments.replay \
gs=rope \
env=xarm_gripper \
physics.ckpt_path=log/phystwin/rope \
physics.case_name=rope_0001 \
gt_dir=log/policy_rollouts/rope_act_7000 \
"$@"
