"""Native (C++) host-side data engine.

The reference's host-side batch machinery is torch's DataLoader — Python
workers collating through torch's native C++ core (reference
crossmodal/train_helpers.py:16-26). This package is the framework's native
analog: `host_engine.cpp` implements the dataset-size-proportional host ops
(window gather, row gather, z-score normalization, stride-2 image subsample,
blackout mask application, time-major eval stacking) as multithreaded
flat-buffer C kernels, bound here via ctypes.

Build model: the shared library is compiled with g++ on first use and cached
under ``.scratch/native/`` keyed by a hash of the source, so repeated imports
pay nothing. If no toolchain is available (or compilation fails) every
wrapper transparently falls back to its numpy expression — the engine is an
accelerator, never a requirement. Set ``MMF_TPU_NATIVE=0`` to force the
numpy paths (used by the parity tests).

All wrappers are bitwise-identical to the numpy expressions they replace
(tests/test_native_engine.py asserts this op by op).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("host_engine.cpp")
_ABI_VERSION = 4

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False
_build_error: Optional[str] = None


def _cache_dir() -> Path:
    # Keep build artifacts next to the repo's other scratch state (the JAX
    # compile cache lives in .scratch/jax_cache).
    root = Path(__file__).resolve().parents[2]
    d = root / ".scratch" / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(
        (src + f"|abi{_ABI_VERSION}|{sys.platform}").encode()
    ).hexdigest()[:16]
    so_path = _cache_dir() / f"host_engine_{tag}.so"
    if not so_path.exists():
        # Per-process temp name so concurrent builders never write the same
        # file; the final os.replace is atomic (last writer wins, all
        # writers produce identical bytes).
        tmp = so_path.with_suffix(f".so.tmp{os.getpid()}")
        base_cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            str(_SRC), "-o", str(tmp),
        ]
        try:
            subprocess.run(
                base_cmd[:1] + ["-march=native"] + base_cmd[1:],
                check=True, capture_output=True, timeout=120,
            )
        except subprocess.CalledProcessError:
            # Some toolchains/VMs reject -march=native; retry portable.
            subprocess.run(
                base_cmd, check=True, capture_output=True, timeout=120
            )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(str(so_path))
    lib.mmf_abi_version.restype = ctypes.c_int
    if lib.mmf_abi_version() != _ABI_VERSION:
        raise RuntimeError(
            f"stale native cache: abi {lib.mmf_abi_version()} != {_ABI_VERSION}"
        )

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    ci = ctypes.c_int
    lib.mmf_window_gather.argtypes = [f32p, f32p, i64p, i64, i64, i64, ci]
    lib.mmf_row_gather.argtypes = [f32p, f32p, i64p, i64, i64, ci]
    lib.mmf_normalize.argtypes = [f32p, f32p, i64, i64, f32p, f32p, ci]
    lib.mmf_subsample2.argtypes = [f32p, f32p, i64, i64, i64, ci]
    lib.mmf_apply_mask.argtypes = [f32p, f32p, f32p, i64, i64, ci]
    lib.mmf_stack_axis1.argtypes = [
        ctypes.POINTER(f32p), f32p, i64, i64, i64, ci,
    ]
    for fn in (
        lib.mmf_window_gather, lib.mmf_row_gather, lib.mmf_normalize,
        lib.mmf_subsample2, lib.mmf_apply_mask, lib.mmf_stack_axis1,
    ):
        fn.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted, _build_error
    if os.environ.get("MMF_TPU_NATIVE", "1") == "0":
        return None
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is None and not _build_attempted:
            _build_attempted = True
            try:
                _lib = _build()
            except Exception as exc:  # toolchain absent / compile failure
                _build_error = f"{type(exc).__name__}: {exc}"
    return _lib


def available() -> bool:
    """True if the native engine built (or was already cached) and loaded."""
    return _get_lib() is not None


def build_error() -> Optional[str]:
    """The error that disabled the native engine, if any (for diagnostics)."""
    _get_lib()
    return _build_error


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _as_rows(a: np.ndarray) -> np.ndarray:
    """View (T, ...) float32 array as contiguous (T, row_elems)."""
    assert a.dtype == np.float32, a.dtype
    a = np.ascontiguousarray(a)
    return a.reshape(a.shape[0], -1) if a.ndim != 2 else a


def window_gather(
    src: np.ndarray, starts: np.ndarray, window_len: int, n_threads: int = 0
) -> np.ndarray:
    """np.stack([src[s : s + window_len] for s in starts]) for `src` of shape
    (T, ...). Windows may overlap (arbitrary starts). The native kernel
    handles float32; other dtypes take a dtype-PRESERVING numpy path (no
    silent downcast of float64/int trajectory arrays)."""
    src = np.ascontiguousarray(src)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    if starts.ndim != 1:
        raise ValueError(f"starts must be 1-D, got shape {starts.shape}")
    if starts.size:
        # Real errors (not asserts): under `python -O` an assert vanishes and
        # the C kernel would memcpy out-of-bounds instead of raising.
        if int(starts.min()) < 0 or int(starts.max()) + window_len > src.shape[0]:
            raise ValueError(
                f"window [start, start+{window_len}) out of bounds for "
                f"src with {src.shape[0]} rows "
                f"(starts min {int(starts.min())}, max {int(starts.max())})"
            )
    out = np.empty((starts.size, window_len) + src.shape[1:], dtype=src.dtype)
    lib = _get_lib()
    if lib is None or src.dtype != np.float32:
        for i, s in enumerate(starts):
            out[i] = src[s : s + window_len]
        return out
    rows = _as_rows(src)
    lib.mmf_window_gather(
        _f32p(rows), _f32p(out), _i64p(starts), starts.size, window_len,
        rows.shape[1], n_threads,
    )
    return out


def row_gather(src: np.ndarray, idx: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """src[idx] for `src` of shape (T, ...). Native kernel for float32;
    dtype-preserving numpy fallback otherwise."""
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.ndim != 1:
        raise ValueError(f"idx must be 1-D, got shape {idx.shape}")
    if idx.size:
        if int(idx.min()) < 0 or int(idx.max()) >= src.shape[0]:
            raise ValueError(
                f"index out of bounds for src with {src.shape[0]} rows "
                f"(idx min {int(idx.min())}, max {int(idx.max())})"
            )
    lib = _get_lib()
    if lib is None or src.dtype != np.float32:
        return src[idx]
    out = np.empty((idx.size,) + src.shape[1:], dtype=np.float32)
    rows = _as_rows(src)
    lib.mmf_row_gather(
        _f32p(rows), _f32p(out), _i64p(idx), idx.size, rows.shape[1], n_threads
    )
    return out


def normalize(
    array: np.ndarray, mean: np.ndarray, std: np.ndarray, n_threads: int = 0
) -> np.ndarray:
    """(array - mean) / std over the trailing axis, float32 arithmetic —
    bitwise-equal to the loaders' numpy expression (same op order), computed
    in one pass into a fresh array (numpy pays two temporaries)."""
    src = np.ascontiguousarray(array, dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32).reshape(-1)
    std = np.ascontiguousarray(std, dtype=np.float32).reshape(-1)
    row_elems = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    assert mean.size == row_elems and std.size == row_elems, (
        mean.size, std.size, row_elems,
    )
    lib = _get_lib()
    if lib is None:
        trail = src.shape[1:] if src.ndim > 1 else ()
        return ((src - mean.reshape(trail)) / std.reshape(trail)).astype(
            np.float32
        )
    out = np.empty_like(src)
    n_rows = src.shape[0] if src.ndim > 1 else src.size
    lib.mmf_normalize(
        _f32p(src), _f32p(out), n_rows, row_elems, _f32p(mean), _f32p(std),
        n_threads,
    )
    return out


def subsample2(images: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """images[:, ::2, ::2] for float32 (T, H, W)."""
    images = np.ascontiguousarray(images, dtype=np.float32)
    assert images.ndim == 3
    lib = _get_lib()
    if lib is None:
        return np.ascontiguousarray(images[:, ::2, ::2])
    t, h, w = images.shape
    out = np.empty((t, (h + 1) // 2, (w + 1) // 2), dtype=np.float32)
    lib.mmf_subsample2(_f32p(images), _f32p(out), t, h, w, n_threads)
    return out


def apply_mask(images: np.ndarray, keep: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """images * keep.reshape(T, 1, ..., 1) (per-timestep scalar broadcast),
    in a fresh array (single src->dst pass)."""
    src = np.ascontiguousarray(images, dtype=np.float32)
    keep = np.ascontiguousarray(keep, dtype=np.float32).reshape(-1)
    assert keep.size == src.shape[0]
    lib = _get_lib()
    if lib is None:
        return src * keep.reshape((-1,) + (1,) * (src.ndim - 1))
    out = np.empty_like(src)
    frame = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    lib.mmf_apply_mask(
        _f32p(src), _f32p(out), _f32p(keep), src.shape[0], frame, n_threads
    )
    return out


def stack_axis1(arrays, t_min: int, n_threads: int = 0) -> np.ndarray:
    """np.stack([a[:t_min] for a in arrays], axis=1) for float32 (T_i, ...)
    arrays with identical trailing shapes (eval batching)."""
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    assert arrays, "empty batch"
    trail = arrays[0].shape[1:]
    for a in arrays:
        assert a.shape[0] >= t_min and a.shape[1:] == trail, (a.shape, t_min)
    lib = _get_lib()
    if lib is None:
        return np.stack([a[:t_min] for a in arrays], axis=1)
    n = len(arrays)
    out = np.empty((t_min, n) + trail, dtype=np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ptrs = (f32p * n)(*[_f32p(a) for a in arrays])
    row_elems = int(np.prod(trail)) if trail else 1
    lib.mmf_stack_axis1(ptrs, _f32p(out), n, t_min, row_elems, n_threads)
    return out
