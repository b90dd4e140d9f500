"""Native (C++) host-data-engine tests: each ctypes kernel must be
bitwise-identical to the numpy expression it replaces, the numpy fallback
(MMF_TPU_NATIVE=0) must agree with the native path, and the data-pipeline
integration points (SubsequenceDataset windowing, door loader) must produce
identical arrays with the engine on and off."""

import numpy as np
import pytest

from multimodalfilter_tpu import native
from multimodalfilter_tpu.data.datasets import SubsequenceDataset
from multimodalfilter_tpu.types import Trajectory

rng = np.random.default_rng(1234)


requires_native = pytest.mark.skipif(
    not native.available(),
    reason=f"native engine unavailable: {native.build_error()}",
)


def _fallback(fn, *args, **kwargs):
    """Call a wrapper with the native library forcibly hidden, exercising its
    numpy path."""
    saved = native._lib
    native._lib = None
    saved_env = native.os.environ.get("MMF_TPU_NATIVE")
    native.os.environ["MMF_TPU_NATIVE"] = "0"
    try:
        return fn(*args, **kwargs)
    finally:
        native._lib = saved
        if saved_env is None:
            del native.os.environ["MMF_TPU_NATIVE"]
        else:
            native.os.environ["MMF_TPU_NATIVE"] = saved_env


@requires_native
@pytest.mark.parametrize("trail", [(7,), (4, 5), (32, 32)])
def test_window_gather_bitwise(trail):
    src = rng.standard_normal((300,) + trail).astype(np.float32)
    starts = rng.integers(0, 290, size=41).astype(np.int64)
    out = native.window_gather(src, starts, 10)
    ref = np.stack([src[s : s + 10] for s in starts])
    assert np.array_equal(out, ref)
    assert np.array_equal(_fallback(native.window_gather, src, starts, 10), ref)


@requires_native
def test_window_gather_overlapping_and_empty():
    src = rng.standard_normal((64, 3)).astype(np.float32)
    starts = np.arange(0, 55, 1, dtype=np.int64)  # maximally overlapping
    out = native.window_gather(src, starts, 10)
    assert np.array_equal(out, np.stack([src[s : s + 10] for s in starts]))
    empty = native.window_gather(src, np.empty(0, dtype=np.int64), 10)
    assert empty.shape == (0, 10, 3)


@requires_native
def test_row_gather_bitwise():
    src = rng.standard_normal((1000, 13)).astype(np.float32)
    idx = rng.integers(0, 1000, size=4097).astype(np.int64)
    assert np.array_equal(native.row_gather(src, idx), src[idx])
    assert np.array_equal(_fallback(native.row_gather, src, idx), src[idx])


@requires_native
def test_normalize_bitwise():
    x = rng.standard_normal((2048, 7)).astype(np.float32) * 50
    mean = rng.standard_normal(7).astype(np.float32)
    std = (rng.random(7).astype(np.float32) + 0.1) * 3
    ref = ((x - mean) / std).astype(np.float32)
    assert np.array_equal(native.normalize(x, mean, std), ref)
    assert np.array_equal(_fallback(native.normalize, x, mean, std), ref)
    # Input must not be mutated (wrapper copies).
    assert x.dtype == np.float32 and not np.array_equal(x, ref)


@requires_native
@pytest.mark.parametrize("hw", [(64, 64), (63, 65), (2, 2)])
def test_subsample2_bitwise(hw):
    img = rng.standard_normal((17,) + hw).astype(np.float32)
    ref = np.ascontiguousarray(img[:, ::2, ::2])
    assert np.array_equal(native.subsample2(img), ref)
    assert np.array_equal(_fallback(native.subsample2, img), ref)


@requires_native
def test_apply_mask_bitwise():
    img = rng.standard_normal((40, 32, 32)).astype(np.float32)
    keep = (rng.random(40) > 0.4).astype(np.float32).reshape(40, 1, 1)
    ref = img * keep
    assert np.array_equal(native.apply_mask(img, keep), ref)
    assert np.array_equal(_fallback(native.apply_mask, img, keep), ref)


@requires_native
def test_stack_axis1_bitwise():
    arrays = [
        rng.standard_normal((int(t), 32, 32)).astype(np.float32)
        for t in rng.integers(50, 90, size=7)
    ]
    t_min = min(a.shape[0] for a in arrays)
    ref = np.stack([a[:t_min] for a in arrays], axis=1)
    assert np.array_equal(native.stack_axis1(arrays, t_min), ref)
    assert np.array_equal(_fallback(native.stack_axis1, arrays, t_min), ref)


@requires_native
def test_thread_count_invariance():
    """Static partitioning must be deterministic across thread counts."""
    src = rng.standard_normal((5000, 11)).astype(np.float32)
    idx = rng.integers(0, 5000, size=5000).astype(np.int64)
    one = native.row_gather(src, idx, n_threads=1)
    for n in (2, 7, 16):
        assert np.array_equal(native.row_gather(src, idx, n_threads=n), one)


def _make_trajs(n=3, t=37):
    trajs = []
    for i in range(n):
        trajs.append(
            Trajectory(
                rng.standard_normal((t + i, 3)).astype(np.float32),
                {
                    "image": rng.standard_normal((t + i, 8, 8)).astype(np.float32),
                    "pos": rng.standard_normal((t + i, 3)).astype(np.float32),
                },
                rng.standard_normal((t + i, 7)).astype(np.float32),
            )
        )
    return trajs


def test_subsequence_dataset_native_vs_fallback():
    trajs = _make_trajs()
    ds_native = SubsequenceDataset(trajs, subsequence_length=8)
    ds_numpy = _fallback(SubsequenceDataset, trajs, subsequence_length=8)
    assert np.array_equal(ds_native.states, ds_numpy.states)
    assert np.array_equal(ds_native.controls, ds_numpy.controls)
    for k in ds_native.observations:
        assert np.array_equal(ds_native.observations[k], ds_numpy.observations[k])
    # Reference-parity shape: floor(T/L) windows per trajectory.
    assert len(ds_native) == sum((t.states.shape[0] // 8) for t in trajs)


def test_subsequence_dataset_stride():
    """stride < L yields overlapping windows; stride == L matches default."""
    trajs = _make_trajs(n=1, t=40)
    base = SubsequenceDataset(trajs, subsequence_length=8)
    same = SubsequenceDataset(trajs, subsequence_length=8, stride=8)
    assert np.array_equal(base.states, same.states)
    dense = SubsequenceDataset(trajs, subsequence_length=8, stride=2)
    t = trajs[0].states.shape[0]
    assert len(dense) == len(range(0, t - 8 + 1, 2))
    # Window at start 2 must equal the raw slice.
    assert np.array_equal(dense.states[1], trajs[0].states[2:10])


def test_door_loader_native_vs_fallback(tmp_path, monkeypatch):
    """The full door loader (normalize + subsample + mask through the native
    engine) produces arrays identical to the pure-numpy path."""
    monkeypatch.setenv("MMF_TPU_SYNTHESIZE_DATA", "1")
    monkeypatch.setenv("MMF_TPU_SYNTH_TRAJ", "2")
    monkeypatch.setenv("MMF_TPU_SYNTH_T", "32")
    import multimodalfilter_tpu.data.cache as cache_mod
    from multimodalfilter_tpu.data import set_cache_path

    set_cache_path(str(tmp_path))
    try:
        from crossmodal.tasks._door import _load_trajectories

        kwargs = dict(
            use_vision=True,
            use_proprioception=True,
            use_haptics=True,
            image_blackout_ratio=0.2,
            sequential_image_rate=1,
            seed=7,
        )
        a = _load_trajectories("panda_door_pull_10.hdf5", **kwargs)
        b = _fallback(
            _load_trajectories, "panda_door_pull_10.hdf5", **kwargs
        )
        assert len(a) == len(b) > 0
        for ta, tb in zip(a, b):
            assert np.array_equal(ta.states, tb.states)
            assert np.array_equal(ta.controls, tb.controls)
            for k in ta.observations:
                assert np.array_equal(ta.observations[k], tb.observations[k])
    finally:
        cache_mod._cache_path = None


def test_gather_dtype_preserved():
    """Non-float32 inputs take the dtype-preserving numpy path — float64/int
    trajectory arrays must not be silently downcast (round-2 advisor)."""
    for dtype in (np.float64, np.int32, np.int64):
        src = np.arange(40, dtype=dtype).reshape(10, 4)
        out = native.window_gather(src, np.array([0, 3], np.int64), 5)
        assert out.dtype == dtype
        assert np.array_equal(out[1], src[3:8])
        out2 = native.row_gather(src, np.array([2, 9], np.int64))
        assert out2.dtype == dtype
        assert np.array_equal(out2, src[[2, 9]])


def test_gather_bounds_raise_value_error():
    """Out-of-range windows/indices raise ValueError (not assert — asserts
    vanish under `python -O` and the C kernel would read out of bounds)."""
    src = np.zeros((10, 4), np.float32)
    with pytest.raises(ValueError):
        native.window_gather(src, np.array([7], np.int64), 5)
    with pytest.raises(ValueError):
        native.window_gather(src, np.array([-1], np.int64), 5)
    with pytest.raises(ValueError):
        native.row_gather(src, np.array([10], np.int64))
    with pytest.raises(ValueError):
        native.row_gather(src, np.array([-1], np.int64))
