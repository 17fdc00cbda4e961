"""Minimal on-chip repro for the fine-kernel TPU worker crash.

Round-5 chip session: ``bench.py --write-golden --kernel fine`` crashed the
TPU worker ("kernel fault") inside the B=64 flagship render, while every
B=1 --check and the 4000g chip smoke passed. The two suspects, isolated at
the exact shapes the flagship uses but with tiny synthetic pair data:

  1. rasterize_fine_batch at wrist scale: the SMEM guard splits instances
     so each of the 3 scalar-prefetch arrays stays under 0.3e6 bytes, but
     22 x 3360 i32 x 3 arrays = ~886 KB TOTAL, which may exceed SMEM.
  2. rasterize_fine_sparse at headline dirty-supertile budgets.

Run stages separately to attribute the fault:
    python scripts/repro_fine_fault.py --stage batch --inst 22
    python scripts/repro_fine_fault.py --stage sparse --inst 8
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_data(n_pairs_rows: int):
    """Tiny deterministic attr-major packed table."""
    rng = np.random.default_rng(0)
    d = rng.uniform(0.1, 0.9, size=(n_pairs_rows, 128)).astype(np.float32)
    return jnp.asarray(d)


def stage_batch(n_inst: int, nsx: int = 7, nsy: int = 60):
    from real2sim_eval_tpu.renderer.fine_kernel import (GROUPS,
                                                        rasterize_fine_batch)
    n_fine = nsx * nsy * GROUPS
    # a handful of short streams; everything else empty
    starts = np.zeros((n_inst, n_fine), np.int32)
    ends = np.zeros((n_inst, n_fine), np.int32)
    ends[:, :16] = 8
    starts[:, 1:17] = 8
    ends[:, 1:17] = 16
    data = make_data(64)
    rgb, dep = rasterize_fine_batch(data, jnp.asarray(starts),
                                    jnp.asarray(ends), nsx, nsy,
                                    bg=(0.0, 0.0, 0.0))
    jax.block_until_ready((rgb, dep))
    print(f"batch ok: inst={n_inst} n_fine={n_fine} "
          f"rgb={rgb.shape} finite={bool(jnp.isfinite(rgb).all())}")


def stage_sparse(n_inst: int, s_budget: int = 512, nsx: int = 7,
                 nsy: int = 60):
    from real2sim_eval_tpu.renderer.fine_kernel import GROUPS, SUP_H, SUP_W
    from real2sim_eval_tpu.renderer.incremental_fine import \
        rasterize_fine_sparse
    n_super = nsx * nsy
    n_fine = n_super * GROUPS
    n_slots = s_budget * GROUPS
    slot_ids = np.full((n_inst, n_slots), n_fine, np.int32)   # sentinels
    slot_ids[:, :GROUPS] = np.arange(GROUPS, dtype=np.int32)  # supertile 0
    starts = np.zeros((n_inst, n_slots), np.int32)
    ends = np.zeros((n_inst, n_slots), np.int32)
    ends[:, :GROUPS] = 8
    data = make_data(64)
    h_pad, w_pad = nsy * SUP_H, nsx * SUP_W
    rgbc = jnp.zeros((n_inst, 3, h_pad + SUP_H, w_pad), jnp.float32)
    depc = jnp.zeros((n_inst, h_pad + SUP_H, w_pad), jnp.float32)
    rgb, dep = rasterize_fine_sparse(data, jnp.asarray(slot_ids),
                                     jnp.asarray(starts), jnp.asarray(ends),
                                     rgbc, depc, nsx, nsy, bg=(0.0, 0.0, 0.0))
    jax.block_until_ready((rgb, dep))
    print(f"sparse ok: inst={n_inst} s_budget={s_budget} "
          f"rgb={rgb.shape} finite={bool(jnp.isfinite(rgb).all())}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("batch", "sparse"), required=True)
    ap.add_argument("--inst", type=int, default=22)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--nsx", type=int, default=7)
    ap.add_argument("--nsy", type=int, default=60)
    a = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    if a.stage == "batch":
        stage_batch(a.inst, a.nsx, a.nsy)
    else:
        stage_sparse(a.inst, a.budget, a.nsx, a.nsy)
