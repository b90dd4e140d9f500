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
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

TIMESTEPS = int(os.environ.get("BENCH_T", "100"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "16"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))

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
    import jax
    import jax.numpy as jnp

    import crossmodal.door_models as door_models

    model = getattr(door_models, model_name)()
    defn = model.definition
    from multimodalfilter_tpu.utils.precision import (
        with_compute_dtype,
        with_fold_tail,
        with_scan_unroll,
    )

    if bf16:
        defn = with_compute_dtype(defn, jnp.bfloat16)
    if fold:
        defn = with_fold_tail(defn, True)
    if unroll > 1:
        defn = with_scan_unroll(defn, unroll)
    if hoist_ctrl is not None:
        from multimodalfilter_tpu.utils.precision import with_hoist_ctrl

        defn = with_hoist_ctrl(defn, hoist_ctrl)
    if stack_children is not None and any(
        f.name == "stack_children" for f in dataclasses.fields(defn)
    ):
        defn = dataclasses.replace(defn, stack_children=stack_children)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    obs_seq = {
        "image": jax.random.normal(
            ks[0], (TIMESTEPS, batch, 32, 32), jnp.float32
        ),
        "gripper_pos": jax.random.normal(ks[1], (TIMESTEPS, batch, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (TIMESTEPS, batch, 7)),
    }
    controls_seq = jax.random.normal(ks[3], (TIMESTEPS, batch, 7))
    mean = jnp.zeros((batch, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (batch, 3, 3))
    belief = defn.initialize_beliefs(
        model.params, ks[4], mean, cov, train=False
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_chained(params, belief, obs_seq, controls_seq, key, reps: int):
        def body(carry, i):
            b, acc = carry
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs_seq)
            ctrl_i = controls_seq + eps
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl_i, jax.random.fold_in(key, i),
                train=False,
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (belief, jnp.float32(0)), jnp.arange(reps)
        )
        return acc

    t0 = time.perf_counter()
    float(run_chained(model.params, belief, obs_seq, controls_seq, key, CHAIN))
    print(
        f"[kf-bench] {model_name} compile+first run: "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    float(
        run_chained(
            model.params, belief, obs_seq, controls_seq,
            jax.random.PRNGKey(99), CHAIN,
        )
    )
    times = []
    for i in range(REPEATS):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        float(
            run_chained(model.params, belief, obs_seq, controls_seq, k, CHAIN)
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    return TIMESTEPS * batch * CHAIN / best


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
