#!/usr/bin/env bash
# Launch wrapper mirroring the reference's
# experiments/scripts/eval_policy_parallel/rope_act.sh (exact task/policy configuration,
# incl. any per-task overrides). TPU device selection is implicit
# (one jax process per host); use eval_policy_parallel for batched
# multi-env evaluation instead of process-per-GPU fan-out.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m real2sim_eval_tpu.experiments.eval_policy_parallel \
gs=rope \
env=xarm_gripper \
physics.ckpt_path=log/phystwin/rope \
physics.case_name=rope_0001 \
policy.inference_cfg_path=policy/configs/inference/insert_rope.json \
policy.checkpoint_path=log/policy_checkpoints/act-insert-rope/checkpoints/007000 \
gs.use_grid_randomization=False \
policy.n_episodes=200 \
"$@"
