"""Profile the serving program on the TPU and report per-HLO-op time/FLOPs/
HBM bytes — the measurement that settles the encoder-fusion question
(VERDICT r3 item #1: "estimate-free either way") and the N=1 latency
attribution (item #6).

Usage (on the real chip):
    python scripts/profile_serving.py --mode saturated   # N=SAT_BATCH bf16+fold
    python scripts/profile_serving.py --mode n1          # N=1 production stack
    python scripts/profile_serving.py --mode fp32        # N=SAT_BATCH fp32+fold
    python scripts/profile_serving.py --mode train       # bf16 B=512 train epoch

Captures ONE timed rep of bench.py's exact chained serving program under
`jax.profiler.trace`, then converts the xplane capture with xprof's
converter (`hlo_stats` tool) and prints:
  - top ops by self-time, with occurrences, avg time, FLOPs, bytes accessed,
    and the implied achieved TF/s + GB/s per op;
  - an encoder-stage rollup (conv1 / resblock / conv2 / folded tail) keyed
    on HLO op names, with the stage's measured HBM bytes vs its analytic
    activation traffic — i.e. whether inter-stage activation round-trips
    actually hit HBM or stayed fused/resident.

The reference has no profiling at all (SURVEY §5 tracing row); this is part
of the TPU-native observability surface.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(mode: str, trace_dir: str, chain: int) -> None:
    """Run bench.py's chained serving program once under the profiler."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    import bench  # noqa: E402  (repo-root bench harness; main() is guarded)
    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.utils.precision import (
        with_compute_dtype,
        with_fold_tail,
    )

    batch = {"saturated": bench.SAT_BATCH, "fp32": bench.SAT_BATCH, "n1": 1}[mode]
    bf16 = mode != "fp32"

    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition,
        num_particles_eval=bench.PARTICLES,
        pallas_resample=jax.default_backend() == "tpu",
    )
    if bf16:
        defn = with_compute_dtype(defn, jnp.bfloat16)
    defn = with_fold_tail(defn, True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    T = bench.TIMESTEPS
    obs_seq = {
        "image": jax.random.normal(ks[0], (T, batch, 32, 32), jnp.float32),
        "gripper_pos": jax.random.normal(ks[1], (T, batch, 3), jnp.float32),
        "gripper_sensors": jax.random.normal(ks[2], (T, batch, 7), jnp.float32),
    }
    controls_seq = jax.random.normal(ks[3], (T, batch, 7), jnp.float32)
    mean = jnp.zeros((batch, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (batch, 3, 3))
    belief = defn.initialize_beliefs(model.params, ks[4], mean, cov, train=False)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_chained(params, belief, obs_seq, controls_seq, key, reps: int):
        def body(carry, i):
            b, acc = carry
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs_seq)
            ctrl_i = controls_seq + eps
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl_i, jax.random.fold_in(key, i),
                train=False, enabled=(True, True),
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (belief, jnp.float32(0)), jnp.arange(reps)
        )
        return acc

    t0 = time.perf_counter()
    float(run_chained(model.params, belief, obs_seq, controls_seq, key, chain))
    print(f"[profile] compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    float(run_chained(model.params, belief, obs_seq, controls_seq,
                      jax.random.PRNGKey(99), chain))

    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    try:
        float(run_chained(model.params, belief, obs_seq, controls_seq,
                          jax.random.PRNGKey(7), chain))
    finally:
        jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    steps = T * batch * chain
    print(
        f"[profile] traced rep: {wall * 1e3:.1f} ms / {steps} filter-steps "
        f"-> {steps / wall:.0f} steps/s (incl. trace overhead)",
        file=sys.stderr, flush=True,
    )


def capture_train(trace_dir: str, steps: int, batch: int, bf16: bool) -> None:
    """Run bench.py's epoch-jit BPTT train program once under the profiler.

    The program is built by ``bench.make_train_program`` — the SAME builder
    bench_train measures — so the profiled attribution can never silently
    diverge from the benchmarked program (advisor r4). Default is the
    saturated config (B=512, L=16, bf16) behind the reported train MFU, with
    a short epoch (default 4 optimizer steps) to keep the trace compact.
    """
    import jax

    import bench  # noqa: E402

    prog = bench.make_train_program(batch, bf16)
    seq_len = prog["seq_len"]
    model, data = prog["model"], prog["data"]
    tx, epoch = prog["tx"], prog["epoch"]

    idx = prog["make_idx"](steps)

    def run_once(params, opt_state, k):
        p, o, loss = epoch(params, opt_state, data, idx, k)
        float(loss)
        return p, o

    t0 = time.perf_counter()
    params, opt_state = model.params, tx.init(model.params)
    params, opt_state = run_once(params, opt_state, jax.random.PRNGKey(1))
    print(f"[profile] compile+first epoch: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    params, opt_state = run_once(params, opt_state, jax.random.PRNGKey(2))

    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    try:
        run_once(params, opt_state, jax.random.PRNGKey(3))
    finally:
        jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    fsteps = steps * batch * (seq_len - 1)
    print(
        f"[profile] traced epoch: {wall * 1e3:.1f} ms / {steps} opt-steps "
        f"(B={batch}, L={seq_len}) -> {fsteps / wall:.0f} train "
        "filter-steps/s (incl. trace overhead)",
        file=sys.stderr, flush=True,
    )


def _find_xplane(trace_dir: str) -> str:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return paths[-1]


def hlo_stats(xplane_path: str):
    """Convert an xplane capture to per-HLO-op rows via xprof (gviz JSON)."""
    from xprof.convert import raw_to_tool_data as rtd

    data, _ctype = rtd.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    rows = []
    for row in d["rows"]:
        rows.append({
            cid: (cell or {}).get("v") for cid, cell in zip(cols, row["c"])
        })
    return rows


def analyze(xplane_path: str, mode: str, top: int = 25) -> dict:
    def num(v):
        try:
            return float(v or 0)
        except (TypeError, ValueError):
            return 0.0

    ops = []
    for r in hlo_stats(xplane_path):
        self_us = num(r.get("total_self_time"))
        if self_us <= 0:
            continue
        ops.append({
            "name": str(r.get("hlo_op_name") or ""),
            "tf_op": str(r.get("tf_op_name") or ""),
            "category": str(r.get("category") or ""),
            "occurrences": int(num(r.get("occurrences"))),
            "self_time_us": self_us,
            # model_flop_rate is GFLOP/s; memory BWs are GB/s.
            "achieved_tflops": num(r.get("model_flop_rate")) / 1e3,
            # bytes = BW * self-time (xprof reports rates; invert to totals)
            "bytes_total": num(r.get("measured_memory_bw")) * 1e3 * self_us,
            "hbm_bytes_total": num(r.get("hbm_bw")) * 1e3 * self_us,
            "bound_by": str(r.get("bound_by") or ""),
            "expr": str(r.get("hlo_op_expression") or "")[:200],
        })
    ops.sort(key=lambda o: -o["self_time_us"])
    total_us = sum(o["self_time_us"] for o in ops)

    print(f"\n=== hlo_stats ({mode}): total device self-time "
          f"{total_us / 1e3:.1f} ms across {len(ops)} ops ===")
    print(f"{'op':<36}{'tf op (scope tail)':<34}{'occ':>5}{'self ms':>9}"
          f"{'%':>6}{'TF/s':>7}{'GB tot':>8}{'HBM GB':>8}  bound_by")
    for o in ops[:top]:
        print(f"{o['name'][:35]:<36}{o['tf_op'][-33:]:<34}"
              f"{o['occurrences']:>5}{o['self_time_us'] / 1e3:>9.2f}"
              f"{100 * o['self_time_us'] / total_us:>6.1f}"
              f"{o['achieved_tflops']:>7.1f}"
              f"{o['bytes_total'] / 1e9:>8.2f}"
              f"{o['hbm_bytes_total'] / 1e9:>8.2f}  {o['bound_by']}")

    # Encoder-stage rollup keyed on the JAX scope names carried in
    # tf_op_name (flax module paths: .../conv1, .../resblock_conv/...,
    # .../conv2; the folded tail is the conv_general_dilated pair emitted
    # directly in ImageEncoder.__call__) with HLO-shape fallbacks.
    stages = {
        "conv1 (1->32, 5x5)": [],
        "resblock convs (32->32, 3x3)": [],
        "conv2 (32->16, 3x3)": [],
        "folded tail (32x32x16 -> u)": [],
        "other convolution": [],
    }
    for o in ops:
        scope = o["tf_op"].lower()
        text = (o["name"] + " " + o["expr"]).lower()
        is_conv = ("convolution" in o["category"].lower()
                   or "convolution" in text or "conv" in scope)
        if not is_conv:
            continue
        if "conv1" in scope or "5,5,1,32" in text:
            stages["conv1 (1->32, 5x5)"].append(o)
        elif "resblock_conv" in scope or "3,3,32,32" in text:
            stages["resblock convs (32->32, 3x3)"].append(o)
        elif "conv2" in scope or "3,3,32,16" in text:
            stages["conv2 (32->16, 3x3)"].append(o)
        elif ("16,32,32,16" in text or "16,16,128" in text
              or ("imageencoder" in scope and "conv_general_dilated" in scope)):
            stages["folded tail (32x32x16 -> u)"].append(o)
        else:
            stages["other convolution"].append(o)

    # Train-mode rollup: split device time into forward vs backward vs
    # optimizer/infra, keyed on the JAX autodiff scope markers that xprof
    # preserves in tf_op_name ("transpose(jvp(...))" wraps every VJP op;
    # adam state updates live under the optax scope).
    direction = {}
    if mode == "train":
        buckets = {
            "backward (vjp ops)": lambda s, c: "transpose(jvp" in s,
            # Keyed on the jax.named_scope("optimizer") marker that
            # bench.make_train_program wraps around the optax update —
            # optax call-site names do not survive into tf_op_name
            # (advisor r4), so the scope marker is the reliable signal.
            "optimizer (adam/updates)": lambda s, c: (
                "optimizer" in s or "adam" in s or "apply_updates" in s
            ),
            "forward convs": lambda s, c: (
                "convolution" in c.lower() or "conv" in s
            ),
            "forward other": lambda s, c: True,
        }
        for o in ops:
            s = o["tf_op"].lower()
            for label, pred in buckets.items():
                if pred(s, o["category"]):
                    direction.setdefault(label, []).append(o)
                    break
        print("\n=== train fwd/bwd/opt rollup ===")
        for label, group in direction.items():
            t = sum(o["self_time_us"] for o in group)
            hb = sum(o["hbm_bytes_total"] or 0 for o in group)
            flops_weighted = sum(
                o["achieved_tflops"] * o["self_time_us"] for o in group
            )
            print(f"{label:<28}{t / 1e3:>9.2f} ms {100 * t / total_us:>5.1f}%"
                  f"  hbm {hb / 1e9:7.2f} GB"
                  f"  avg {flops_weighted / max(t, 1e-9):5.1f} TF/s"
                  f"  ({len(group)} ops)")

    print("\n=== encoder-stage rollup (name/shape-matched conv ops) ===")
    rollup = {}
    for label, group in stages.items():
        if not group:
            continue
        t = sum(o["self_time_us"] for o in group)
        b = sum(o["bytes_total"] for o in group)
        hb = sum(o["hbm_bytes_total"] or 0 for o in group)
        rollup[label] = {
            "self_ms": t / 1e3,
            "pct": 100 * t / total_us,
            "bytes_gb": b / 1e9,
            "hbm_gb": hb / 1e9,
            "ops": [o["name"] for o in group],
        }
        print(f"{label:<36}{t / 1e3:>9.2f} ms {100 * t / total_us:>5.1f}%"
              f"  bytes {b / 1e9:7.2f} GB  hbm {hb / 1e9:7.2f} GB"
              f"  ({len(group)} ops)")
    return {"total_ms": total_us / 1e3, "ops": ops, "rollup": rollup}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("saturated", "fp32", "n1", "train"),
                    default="saturated")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--chain", type=int, default=None,
                    help="chained reps inside the traced program "
                    "(default: 2 saturated, 16 n1); for --mode train this "
                    "is the optimizer-step count (default 4)")
    ap.add_argument("--train-batch", type=int, default=None,
                    help="train batch (default: BENCH_SAT_BATCH, the "
                    "saturated bf16 config behind the reported train MFU)")
    ap.add_argument("--train-fp32", action="store_true")
    ap.add_argument("--analyze-only", default=None, metavar="XPLANE_OR_DIR",
                    help="skip capture; analyze an existing capture")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.analyze_only:
        path = args.analyze_only
        if os.path.isdir(path):
            path = _find_xplane(path)
    else:
        trace_dir = args.trace_dir or f"/tmp/mmf-profile-{args.mode}"
        if args.mode == "train":
            import bench  # noqa: E402

            capture_train(
                trace_dir,
                steps=args.chain or 4,
                batch=args.train_batch or bench.SAT_BATCH,
                bf16=not args.train_fp32,
            )
        else:
            chain = args.chain or (16 if args.mode == "n1" else 2)
            capture(args.mode, trace_dir, chain)
        path = _find_xplane(trace_dir)
    print(f"[profile] xplane: {path}", file=sys.stderr, flush=True)
    result = analyze(path, args.mode, top=args.top)
    if args.json_out:
        slim = {
            "mode": args.mode,
            "total_ms": result["total_ms"],
            "rollup": result["rollup"],
            "top_ops": [
                {k: v for k, v in o.items() if k != "expr"}
                for o in result["ops"][:args.top]
            ],
        }
        with open(args.json_out, "w") as f:
            json.dump(slim, f, indent=1)
        print(f"[profile] wrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
