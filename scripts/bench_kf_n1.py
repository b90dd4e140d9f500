"""On-chip N=1 serving latency for the EKF family (door task).

The round-4/5 N=1 work all targeted the PF flagship; this measures the
other half of the paper's headline pair — the (crossmodal) virtual-sensor
EKF (reference crossmodal/door_models/{kf,crossmodal_kf}.py) — with the
same house method as bench.py: chained dependent forward_loops in one
program, loop-variant inputs (i*1e-12 perturbation so XLA cannot hoist
the batched encoder passes out of the chain), host-scalar fetch to force
completion through the tunnel.

Usage: python scripts/bench_kf_n1.py [--configs KEY,KEY,...] [--batch N]
Writes one JSON line per config and a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

# Timing knobs (BENCH_T / BENCH_CHAIN / BENCH_REPEATS) are read by bench.py
# at import — the shared bench_kf_jax inherits them.

CONFIGS = {
    # key: (model, bf16, fold, unroll, hoist_ctrl, stack_children)
    # Baselines = pre-round-5 scan bodies (no hoist, no child stacking):
    "kf_base_u1": ("DoorKalmanFilter", True, True, 1, False, None),
    "kf_base_u10": ("DoorKalmanFilter", True, True, 10, False, None),
    "cmkf_base_u1": (
        "DoorCrossmodalKalmanFilter", True, True, 1, False, False
    ),
    "cmkf_base_u10": (
        "DoorCrossmodalKalmanFilter", True, True, 10, False, False
    ),
    # Round-5 levers, one at a time then combined:
    "kf_hoist_u10": ("DoorKalmanFilter", True, True, 10, True, None),
    "cmkf_hoist_u10": (
        "DoorCrossmodalKalmanFilter", True, True, 10, True, False
    ),
    "cmkf_stack_u10": (
        "DoorCrossmodalKalmanFilter", True, True, 10, False, True
    ),
    "cmkf_hoist_stack_u10": (
        "DoorCrossmodalKalmanFilter", True, True, 10, True, True
    ),
    "cmkf_hoist_stack_u1": (
        "DoorCrossmodalKalmanFilter", True, True, 1, True, True
    ),
}


def measure(model_name: str, batch: int, bf16: bool, fold: bool,
            unroll: int, hoist_ctrl, stack_children) -> float:
    """Delegates to bench.bench_kf_jax — the single source of truth for
    the measured program (same pattern as capture_train ->
    bench.make_train_program, advisor r4)."""
    import bench

    return bench.bench_kf_jax(
        model_name=model_name, batch=batch, bf16=bf16, fold=fold,
        unroll=unroll, hoist_ctrl=hoist_ctrl, stack_children=stack_children,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--configs",
        default=(
            "kf_base_u10,kf_hoist_u10,cmkf_base_u10,cmkf_hoist_u10,"
            "cmkf_hoist_stack_u10"
        ),
    )
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    results = []
    for name in args.configs.split(","):
        model_name, bf16, fold, unroll, hoist, stack = CONFIGS[name.strip()]
        t0 = time.perf_counter()
        sps = measure(model_name, args.batch, bf16, fold, unroll, hoist, stack)
        row = {
            "config": name,
            "model": model_name,
            "batch": args.batch,
            "unroll": unroll,
            "hoist_ctrl": hoist,
            "stack_children": stack,
            "us_per_step": round(1e6 * args.batch / sps, 2),
            "steps_per_sec": round(sps, 1),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    print("\n| config | model | unroll | us/step (N=%d) |" % args.batch)
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['config']} | {r['model']} | {r['unroll']} | "
            f"{r['us_per_step']} |"
        )


if __name__ == "__main__":
    main()
