"""Host-data-engine benchmark: native C++ kernels vs the equivalent numpy
expressions, at production-scale shapes (500-trajectory door dataset scale:
~500 x 700 timesteps of 32x32 images + proprio/haptics).

Run: python benchmarks/host_engine.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from multimodalfilter_tpu import native  # noqa: E402


def timeit(fn, repeats=5):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, numpy_fn, native_fn, bytes_moved):
    tn = timeit(numpy_fn)
    tc = timeit(native_fn)
    print(
        f"{name:24s} numpy {tn * 1e3:8.1f} ms   native {tc * 1e3:8.1f} ms   "
        f"speedup {tn / tc:5.2f}x   native BW {bytes_moved / tc / 1e9:6.1f} GB/s"
    )


def main():
    assert native.available(), native.build_error()
    rng = np.random.default_rng(0)

    # ~500 trajectories x 700 steps of 32x32 images, flattened time axis.
    t_total = 350_000
    images = rng.standard_normal((t_total, 32, 32)).astype(np.float32)
    frame = 32 * 32 * 4

    # Window gather: subsequence length 16, ~dense overlapping windows.
    starts = rng.integers(0, t_total - 16, size=40_000).astype(np.int64)
    bench(
        "window_gather L=16",
        lambda: np.stack([images[s : s + 16] for s in starts]),
        lambda: native.window_gather(images, starts, 16),
        2 * 40_000 * 16 * frame,
    )

    idx = rng.permutation(t_total).astype(np.int64)
    bench(
        "row_gather (shuffle)",
        lambda: images[idx],
        lambda: native.row_gather(images, idx),
        2 * t_total * frame,
    )

    mean = rng.standard_normal(1024).astype(np.float32)
    std = (rng.random(1024).astype(np.float32) + 0.5)
    flat = images.reshape(t_total, 1024)
    bench(
        "normalize (z-score)",
        lambda: ((flat - mean) / std).astype(np.float32),
        lambda: native.normalize(flat, mean, std),
        2 * t_total * frame,
    )

    big = rng.standard_normal((60_000, 64, 64)).astype(np.float32)
    bench(
        "subsample2 64->32",
        lambda: np.ascontiguousarray(big[:, ::2, ::2]),
        lambda: native.subsample2(big),
        60_000 * (64 * 64 + 32 * 32) * 4,
    )

    keep = (rng.random(t_total) > 0.3).astype(np.float32)
    bench(
        "apply_mask",
        lambda: images * keep.reshape(-1, 1, 1),
        lambda: native.apply_mask(images, keep),
        2 * t_total * frame,
    )

    arrays = [
        rng.standard_normal((720, 32, 32)).astype(np.float32) for _ in range(480)
    ]
    bench(
        "stack_axis1 (eval)",
        lambda: np.stack([a[:700] for a in arrays], axis=1),
        lambda: native.stack_axis1(arrays, 700),
        2 * 480 * 700 * frame,
    )


if __name__ == "__main__":
    main()
