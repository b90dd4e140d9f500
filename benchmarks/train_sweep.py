"""Train-side batch-saturation sweep (e2e BPTT, flagship door CMPF).

Question (round 3): the B=256 bf16 "saturated" train config encodes only
B*(L-1) = 3,840 frames per optimizer step, vs the 51,200-frame serving
batch that saturates the chip (2.9us/frame vs 6.9us at 480 frames — see
docs/PERFORMANCE.md "Train-step attribution"). Does pushing B to 512/1024
keep scaling train throughput, or does activation memory for the backward
pass bind first? If OOM binds before saturation, encoder rematerialization
(jax.checkpoint) is the enabler; if throughput flattens, B=256 stays the
recommended config and remat is moot.

Usage:  python benchmarks/train_sweep.py [B ...]    (default 256 512 1024)
        MMF_SWEEP_BF16=0 for an fp32 sweep.

Reuses bench.bench_train verbatim so numbers are comparable with bench.py's
train_steps_per_sec_saturated_bf16 (same synthetic shapes, same epoch-scan
donated-buffer path, same chained timing).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    bf16 = os.environ.get("MMF_SWEEP_BF16", "1") == "1"
    results = {}
    for b in batches:
        try:
            sps, _ = bench.bench_train(batch=b, bf16=bf16)
            results[b] = sps
        except Exception as exc:  # OOM surfaces as RuntimeError/XlaRuntimeError
            results[b] = f"FAILED: {type(exc).__name__}: {str(exc)[:200]}"
        print(f"[sweep] B={b} bf16={bf16}: {results[b]}", flush=True)
    print({"train_sweep": results, "bf16": bf16})


if __name__ == "__main__":
    main()
