"""Full per-stage trace of the flagship bench step (physics + render).

VERDICT round-2 item 3: the published BASELINE.md trace attributed only
278 ms of the 454 ms render; this tool produces the COMPLETE table. It
runs the real jitted evaluator functions (never standalone micro-jits —
those materialize intermediates that fuse away in-graph, see the
tpu-perf-lessons memory) under ``jax.profiler.trace``, parses the Chrome
trace JSON directly (tensorboard's xplane proto is broken in this image),
and aggregates device-op time by source file:line -> human stage names.

Usage (on the TPU):
    python -m real2sim_eval_tpu.experiments.utils.trace_step --batch 64
    python -m real2sim_eval_tpu.experiments.utils.trace_step --what render
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time


# stage buckets: first matching (regex on source file) wins; within a file,
# optional line ranges refine the stage.
STAGE_RULES = [
    (r"tile_kernel\.py", "compositor (wide kernel)"),
    (r"fine_kernel\.py", "compositor (fine kernel)"),
    (r"incremental\.py", "incremental merge/bookkeeping"),
    (r"binning\.py", "binning"),
    (r"preprocess\.py", "preprocess"),
    (r"raster\.py", "raster glue (pack/concat)"),
    (r"lbs\.py", "LBS"),
    (r"pallas_step\.py", "physics (pallas kernel + glue)"),
    (r"spring_mass\.py", "physics (xla)"),
    (r"dynamics\.py", "physics ctrl build"),
    (r"kinematics", "IK/FK"),
    (r"batched\.py", "compose/scene concat"),
    (r"transforms\.py", "transforms"),
]


def classify(src: str) -> str:
    for pat, name in STAGE_RULES:
        if re.search(pat, src):
            return name
    return f"other ({src})" if src else "unattributed"


def parse_trace(trace_dir: str):
    """Aggregate device-lane op durations by (stage, source) from the
    chrome trace. Returns (totals_by_stage, totals_by_source, total_us,
    n_events)."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace files under {trace_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # identify device lanes: pids whose process_name metadata mentions the
    # accelerator (axon/TPU) — host python lanes would double-count
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device(pid, tid):
        # op-level lane only: 'XLA Modules' events span whole jit calls and
        # would double-count every op beneath them
        pn = pid_names.get(pid, "").lower()
        tn = tid_names.get((pid, tid), "")
        return "device" in pn and tn == "XLA Ops"

    # self-time only: a parent span (e.g. a lax.scan's `while`) contains its
    # children on the same thread timeline and would double-count them
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        if not is_device(e.get("pid"), e.get("tid")):
            continue
        lanes[(e.get("pid"), e.get("tid"))].append(e)

    by_stage = collections.Counter()
    by_src = collections.Counter()
    n = 0
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda e: (float(e.get("ts", 0.0)),
                                 -float(e.get("dur", 0.0))))
        stack = []  # (end_ts, child_dur_accum index into metas)
        metas = []

        def emit(meta):
            nonlocal n, total
            e, child = meta
            dur = float(e.get("dur", 0.0)) - child
            args = e.get("args", {}) or {}
            src = (args.get("source") or args.get("tf_op")
                   or args.get("long_name") or "")
            key = src if src else e.get("name", "")
            stage = classify(key)
            by_stage[stage] += dur
            by_src[(stage, key[:160])] += dur
            total += dur
            n += 1

        for e in lane:
            ts = float(e.get("ts", 0.0))
            dur = float(e.get("dur", 0.0))
            while stack and stack[-1][0] <= ts + 1e-9:
                emit(metas[stack.pop()[1]])
            if stack:
                parent = metas[stack[-1][1]]
                metas[stack[-1][1]] = (parent[0], parent[1] + dur)
            metas.append((e, 0.0))
            stack.append((ts + dur, len(metas) - 1))
        while stack:
            emit(metas[stack.pop()[1]])
    return by_stage, by_src, total, n


def report(by_stage, by_src, total_us, n_iters, wall_ms, top=6):
    print(f"\n== device-op time over {n_iters} iters "
          f"(wall {wall_ms:.0f} ms/iter) ==")
    print(f"{'stage':<42}{'ms/iter':>9}  {'%':>5}")
    for stage, us in by_stage.most_common():
        print(f"{stage:<42}{us / 1e3 / n_iters:>9.1f}  "
              f"{100.0 * us / max(total_us, 1):>5.1f}")
    print(f"{'TOTAL (device)':<42}{total_us / 1e3 / n_iters:>9.1f}")
    print("\n== top ops per stage ==")
    per_stage = collections.defaultdict(list)
    for (stage, src), us in by_src.items():
        per_stage[stage].append((us, src))
    for stage, us in by_stage.most_common():
        print(f"-- {stage}")
        for us_i, src in sorted(per_stage[stage], reverse=True)[:top]:
            print(f"   {us_i / 1e3 / n_iters:>8.2f} ms  {src}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--what", default="both",
                    choices=("both", "render", "physics"))
    ap.add_argument("--gaussians", type=int, default=0,
                    help="override table gaussian count (0 = bench default)")
    ap.add_argument("--out", default="")
    ap.add_argument("--kernel", default="wide", choices=("wide", "fine"),
                    help="compositor variant (bench.py --kernel)")
    ap.add_argument("--obj-dense", type=int, default=0,
                    help="LBS'd object body splats (bench headline uses "
                         "bench.N_OBJ_DENSE_BIG)")
    ap.add_argument("--precull", default="auto",
                    choices=("auto", "on", "off"),
                    help="wrist static pre-cull (A/B: trace off vs auto)")
    ap.add_argument("--merge-kernel", default="sort",
                    choices=("sort", "stream"),
                    help="incremental merge variant (bench --merge-kernel)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "..", ".."))
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    bench._enable_compile_cache()   # share compiles with bench.py runs
    bench.KERNEL = args.kernel
    t0 = time.time()
    ev = bench.build_evaluator(args.batch,
                               args.gaussians or bench.N_TABLE_SMALL,
                               n_obj_dense=args.obj_dense,
                               wrist_precull=args.precull,
                               merge_kernel=args.merge_kernel)
    print(f"evaluator built in {time.time() - t0:.0f}s", flush=True)

    B = args.batch
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    a = np.concatenate([[0.2, 0.0, 0.3], rot, [1.0]])
    actions = jnp.asarray(np.tile(a, (B, 1)), jnp.float32)

    def one():
        if args.what in ("both", "physics"):
            # flagship semantics: velocity-control mimic ON (cfg default,
            # matching bench.py — the reference defaults it on)
            ev.step(actions)
        if args.what in ("both", "render"):
            return ev.render()[0]
        return ev.state.sm.x

    # warmup/compile
    t0 = time.time()
    bench.sync(one())
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    bench.sync(one())

    trace_dir = args.out or tempfile.mkdtemp(prefix="trace_step_")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        r = None
        for _ in range(args.iters):
            r = one()
        bench.sync(r)
    wall = (time.time() - t0) * 1e3 / args.iters
    print(f"traced {args.iters} iters to {trace_dir}", flush=True)

    by_stage, by_src, total, n = parse_trace(trace_dir)
    print(f"({n} device events)")
    report(by_stage, by_src, total, args.iters, wall)


if __name__ == "__main__":
    main()
