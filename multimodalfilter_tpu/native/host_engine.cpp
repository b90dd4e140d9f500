// Native host-side data engine for multimodalfilter-tpu.
//
// The reference delegates host-side batch assembly to torch's DataLoader,
// whose workers run torch's native (C++) collate/copy machinery
// (reference crossmodal/train_helpers.py:16-26 — DataLoader(num_workers=8)).
// This library is the TPU framework's native analog: the numeric host ops
// that scale with dataset size — subsequence window gathering, shuffled row
// gathering, z-score normalization, stride-2 image subsampling, blackout
// mask application — implemented as flat-buffer C kernels parallelized with
// std::thread. Python binds via ctypes (see __init__.py); every entry point
// is bitwise-identical to the numpy expression it replaces (asserted in
// tests/test_native_engine.py).
//
// Design notes:
//  - All kernels take raw float32/int64 pointers + element counts: no numpy
//    or Python dependency, no allocation (callers own all buffers), so the
//    GIL is released for the whole call via ctypes.
//  - Parallelism is a simple static row partition over n_threads; each
//    kernel is memcpy- or streaming-bound, so static partitioning is optimal
//    and deterministic (no atomics, disjoint writes).
//  - n_threads <= 0 means "use hardware_concurrency, capped at 16".

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int resolve_threads(int n_threads, int64_t work_items) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int n = n_threads > 0 ? n_threads : std::min(hw, 16);
  // Never spawn more threads than work items; degenerate to serial for tiny
  // inputs where thread startup dominates.
  if (work_items < 1024) return 1;
  return static_cast<int>(std::min<int64_t>(n, work_items));
}

// Run fn(begin, end) over [0, total) partitioned across threads.
template <typename Fn>
void parallel_for(int64_t total, int n_threads, Fn fn) {
  int n = resolve_threads(n_threads, total);
  if (n <= 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n - 1);
  int64_t chunk = (total + n - 1) / n;
  for (int i = 1; i < n; ++i) {
    int64_t begin = i * chunk;
    int64_t end = std::min<int64_t>(begin + chunk, total);
    if (begin >= end) break;
    threads.emplace_back([=] { fn(begin, end); });
  }
  fn(0, std::min<int64_t>(chunk, total));
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// ABI version so the Python side can detect stale cached .so files.
int mmf_abi_version() { return 4; }

// Gather `num_windows` contiguous windows of `window_len` rows each from
// `src` (row-major, `row_elems` float32s per row) into `dst`, window w
// starting at row starts[w]. dst shape: (num_windows, window_len, row_elems).
// Equivalent numpy: np.stack([src[s : s + L] for s in starts]).
// Serves SubsequenceDataset assembly — including overlapping windows
// (arbitrary starts), which the pure-reshape numpy path cannot express
// without a copy loop.
void mmf_window_gather(const float* src, float* dst, const int64_t* starts,
                       int64_t num_windows, int64_t window_len,
                       int64_t row_elems, int n_threads) {
  const int64_t window_elems = window_len * row_elems;
  parallel_for(num_windows, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t w = begin; w < end; ++w) {
      std::memcpy(dst + w * window_elems, src + starts[w] * row_elems,
                  sizeof(float) * static_cast<size_t>(window_elems));
    }
  });
}

// Gather rows: dst[i] = src[idx[i]] for row-major float32 matrices.
// Equivalent numpy: src[idx]. Serves shuffled epoch batch assembly.
void mmf_row_gather(const float* src, float* dst, const int64_t* idx,
                    int64_t num_rows, int64_t row_elems, int n_threads) {
  parallel_for(num_rows, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                  sizeof(float) * static_cast<size_t>(row_elems));
    }
  });
}

// Z-score normalization over the trailing axis, src -> dst (may alias):
// dst[r, c] = (src[r, c] - mean[c]) / stddev[c].
// Division (not mul-by-reciprocal) so results stay bitwise-equal to numpy's
// float32 `(a - mean) / std`. Single pass — numpy pays two temporaries.
void mmf_normalize(const float* src, float* dst, int64_t num_rows,
                   int64_t row_elems, const float* mean, const float* stddev,
                   int n_threads) {
  parallel_for(num_rows, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t r = begin; r < end; ++r) {
      const float* in = src + r * row_elems;
      float* out = dst + r * row_elems;
      for (int64_t c = 0; c < row_elems; ++c) {
        out[c] = (in[c] - mean[c]) / stddev[c];
      }
    }
  });
}

// Stride-2 spatial subsample: src (T, H, W) -> dst (T, H/2 ceil, W/2 ceil),
// taking elements [::2, ::2] per frame. Equivalent numpy: src[:, ::2, ::2].
// (Door loader: 64x64 -> 32x32, reference _door.py:174-179.)
void mmf_subsample2(const float* src, float* dst, int64_t t, int64_t h,
                    int64_t w, int n_threads) {
  const int64_t oh = (h + 1) / 2, ow = (w + 1) / 2;
  const int64_t in_frame = h * w, out_frame = oh * ow;
  parallel_for(t, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t f = begin; f < end; ++f) {
      const float* in = src + f * in_frame;
      float* out = dst + f * out_frame;
      for (int64_t y = 0; y < oh; ++y) {
        const float* in_row = in + (2 * y) * w;
        float* out_row = out + y * ow;
        for (int64_t x = 0; x < ow; ++x) out_row[x] = in_row[2 * x];
      }
    }
  });
}

// Per-timestep mask multiply, src -> dst (may alias):
// dst[t] = src[t] * mask[t] broadcast over the frame.
// Equivalent numpy: images * keep.reshape(T, 1, 1). Serves the blackout /
// sequential-rate image masking (reference _door.py:181-197).
void mmf_apply_mask(const float* src, float* dst, const float* mask,
                    int64_t t, int64_t frame_elems, int n_threads) {
  parallel_for(t, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t f = begin; f < end; ++f) {
      const float m = mask[f];
      const float* in = src + f * frame_elems;
      float* out = dst + f * frame_elems;
      for (int64_t c = 0; c < frame_elems; ++c) out[c] = in[c] * m;
    }
  });
}

// Fused eval-batch assembly: truncate each of `n` trajectories to the common
// length `t_min` and interleave time-major: dst[t, i] = src_i[t].
// Equivalent numpy: np.stack([s[:t_min] for s in srcs], axis=1).
// (Eval batching, reference eval_helpers.py:87-106.) `srcs` is an array of
// n pointers, each to a (T_i, row_elems) float32 buffer with T_i >= t_min.
void mmf_stack_axis1(const float** srcs, float* dst, int64_t n, int64_t t_min,
                     int64_t row_elems, int n_threads) {
  parallel_for(t_min, n_threads, [=](int64_t begin, int64_t end) {
    for (int64_t ts = begin; ts < end; ++ts) {
      float* out_t = dst + ts * n * row_elems;
      for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out_t + i * row_elems, srcs[i] + ts * row_elems,
                    sizeof(float) * static_cast<size_t>(row_elems));
      }
    }
  });
}

}  // extern "C"
