"""On-chip same-boot A/B for the round-5 scan hoists at N=1.

Round 4's N=1 attribution (docs/PERFORMANCE.md) put ~23% of per-step
self-time in in-scan threefry chains and ~46% in the per-step model body
(which re-encoded the control row per particle). Round 5 hoisted both out
of the scan (ParticleFilterDef.hoist_rng / hoist_ctrl, bitwise-tested).
This script measures what that bought on the chip, same boot, using the
exact bench.py production N=1 program (bf16 + folded tail + Pallas).

Usage: python scripts/ab_hoist_n1.py [--configs KEY,KEY,...]
Writes one JSON line per config to stdout and a summary table at the end.
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

# Keep the N=1 program small but long enough to amortize the tunnel RTT —
# same knobs bench.py uses for the latency config.
os.environ.setdefault("BENCH_T", "100")

CONFIGS = {
    # key: (hoist_rng, hoist_ctrl, prng, unroll, fused)
    "nohoist_tf_u10": (False, False, "threefry", 10, False),
    "rngonly_tf_u10": (True, False, "threefry", 10, False),
    "hoist_tf_u10": (True, True, "threefry", 10, False),
    "hoist_rbg_u10": (True, True, "unsafe_rbg", 10, False),
    "hoist_tf_u1": (True, True, "threefry", 1, False),
    "nohoist_tf_u1": (False, False, "threefry", 1, False),
    # Whole-trajectory fused Pallas step kernel (ops/pallas_fused_step.py):
    # the scan disappears, so unroll is irrelevant — measure at unroll=1.
    "fused_tf": (True, True, "threefry", 1, True),
    "fused_rbg": (True, True, "unsafe_rbg", 1, True),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--configs",
        default="nohoist_tf_u10,hoist_tf_u10,hoist_rbg_u10,hoist_tf_u1",
        help="comma list of config keys (see CONFIGS)",
    )
    args = ap.parse_args()

    import jax

    import bench

    results = []
    for key in args.configs.split(","):
        hoist_rng, hoist_ctrl, prng, unroll, fused = CONFIGS[key.strip()]
        prev = jax.config.jax_default_prng_impl
        if prng == "unsafe_rbg":
            jax.config.update("jax_default_prng_impl", "unsafe_rbg")
        try:
            t0 = time.perf_counter()
            sps, _ = bench.bench_jax(
                batch=1, bf16=True, fold=True, unroll=unroll,
                hoist_rng=hoist_rng, hoist_ctrl=hoist_ctrl, fused=fused,
            )
        finally:
            jax.config.update("jax_default_prng_impl", prev)
        row = {
            "config": key,
            "hoist_rng": hoist_rng,
            "hoist_ctrl": hoist_ctrl,
            "prng": prng,
            "unroll": unroll,
            "fused": fused,
            "us_per_step": round(1e6 / sps, 2),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    print("\n| config | prng | unroll | hoists | fused | us/step |")
    print("|---|---|---|---|---|---|")
    for r in results:
        hoists = ("rng" if r["hoist_rng"] else "") + (
            "+ctrl" if r["hoist_ctrl"] else ""
        )
        print(
            f"| {r['config']} | {r['prng']} | {r['unroll']} | "
            f"{hoists or 'none'} | {r['fused']} | {r['us_per_step']} |"
        )


if __name__ == "__main__":
    main()
