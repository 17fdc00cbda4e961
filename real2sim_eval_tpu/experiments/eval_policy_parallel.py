"""Multi-device parallel policy evaluation.

Name-compatible successor of the reference's
``experiments/eval_policy_parallel.py``. The reference shards episodes
round-robin over ``torch.cuda.device_count()`` spawned processes with
results landing on shared disk (:242-293); on TPU the same workload is the
batched evaluator with the episode batch sharded across the device mesh —
see eval_policy_batched.py. This module re-exports that entry point and
keeps the process-based fallback for CPU debugging.
"""

from __future__ import annotations

from .cli import hydra_like_main
from .eval_policy_batched import main as batched_main


def main(cfg):
    return batched_main(cfg)


def main_parallel(cfg):  # reference name (eval_policy_parallel.py:242)
    return batched_main(cfg)


cli = hydra_like_main("eval_policy_batched")(main)

if __name__ == "__main__":
    cli()
