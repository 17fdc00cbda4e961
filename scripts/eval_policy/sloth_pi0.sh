#!/usr/bin/env bash
# Launch wrapper mirroring the reference's
# experiments/scripts/eval_policy/sloth_pi0.sh (exact task/policy configuration,
# incl. any per-task overrides). TPU device selection is implicit
# (one jax process per host); use eval_policy_parallel for batched
# multi-env evaluation instead of process-per-GPU fan-out.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m real2sim_eval_tpu.experiments.eval_policy \
gs=sloth \
env=xarm_gripper \
env.sim.duration=15 \
physics.ckpt_path=log/phystwin/sloth \
physics.case_name=sloth_0001 \
policy.inference_cfg_path=policy/configs/inference/pack_sloth.json \
policy.checkpoint_path=log/policy_checkpoints/pi0-pack-sloth/29999 \
"$@"
