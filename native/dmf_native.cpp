// dmf_native: host-side native runtime for the dmf_tpu framework.
//
// The reference's host hot loops are the Nyul percentile fit (pure-Python
// numpy over every pixel of every training image, preprocess_helpers.py:65-83)
// and the per-sample DataLoader worker pool (num_workers=11,
// prepare_single_model.py:141).  This library provides:
//   * nyul_fit      — exact per-sample/per-channel landmark percentiles via
//                     nth_element (O(P) per landmark, no full sort),
//                     multithreaded over (sample, channel) pairs, averaged
//                     into the (C, L) landmark matrix;
//   * percentiles   — the same kernel for a single array;
//   * gather_rows   — parallel strided row gather (batch assembly from a
//                     memory-mapped or in-memory tensor store).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// np.percentile 'linear' interpolation on a scratch copy of the data.
// Percentiles q in [0, 100]; results written to out[0..L).
void percentiles_of(const float* data, int64_t n, const double* q, int L,
                    double* out, std::vector<float>& scratch) {
  scratch.assign(data, data + n);
  for (int l = 0; l < L; ++l) {
    const double rank = q[l] / 100.0 * static_cast<double>(n - 1);
    const int64_t lo = static_cast<int64_t>(std::floor(rank));
    const int64_t hi = std::min<int64_t>(lo + 1, n - 1);
    const double frac = rank - static_cast<double>(lo);
    std::nth_element(scratch.begin(), scratch.begin() + lo, scratch.end());
    const float v_lo = scratch[lo];
    float v_hi = v_lo;
    if (hi != lo) {
      // hi-th order statistic is the min of the upper partition
      v_hi = *std::min_element(scratch.begin() + lo + 1, scratch.end());
    }
    out[l] = static_cast<double>(v_lo) +
             frac * (static_cast<double>(v_hi) - static_cast<double>(v_lo));
  }
}

void parallel_for(int64_t count, int n_threads,
                  const std::function<void(int64_t)>& fn) {
  if (n_threads <= 1 || count <= 1) {
    for (int64_t i = 0; i < count; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  const int workers = std::min<int64_t>(n_threads, count);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        const int64_t i = next.fetch_add(1);
        if (i >= count) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// images: (N, H, W, C) float32 channels-last.
// landmarks: L percentiles in [0, 100].
// out: (C, L) float64 — per-channel landmark averages over the N samples.
int nyul_fit(const float* images, int64_t n, int64_t h, int64_t w, int64_t c,
             const double* landmarks, int L, double* out, int n_threads) {
  if (n <= 0 || h <= 0 || w <= 0 || c <= 0 || L <= 0) return -1;
  const int64_t pix = h * w;
  std::vector<double> per_sample(n * c * L);

  parallel_for(n * c, n_threads, [&](int64_t job) {
    const int64_t s = job / c;
    const int64_t ch = job % c;
    // gather one channel (strided by c in the NHWC layout)
    thread_local std::vector<float> chan;
    thread_local std::vector<float> scratch;
    chan.resize(pix);
    const float* base = images + s * pix * c + ch;
    for (int64_t p = 0; p < pix; ++p) chan[p] = base[p * c];
    percentiles_of(chan.data(), pix, landmarks, L,
                   per_sample.data() + job * L, scratch);
  });

  for (int64_t ch = 0; ch < c; ++ch) {
    for (int l = 0; l < L; ++l) {
      double acc = 0.0;
      for (int64_t s = 0; s < n; ++s) acc += per_sample[(s * c + ch) * L + l];
      out[ch * L + l] = acc / static_cast<double>(n);
    }
  }
  return 0;
}

// data: contiguous float32; percentiles over all n elements.
int percentiles(const float* data, int64_t n, const double* q, int L,
                double* out) {
  if (n <= 0 || L <= 0) return -1;
  std::vector<float> scratch;
  percentiles_of(data, n, q, L, out, scratch);
  return 0;
}

// Parallel batch gather: dst[i] = src[indices[i]] where each row has
// row_elems float32 elements.
int gather_rows(const float* src, const int64_t* indices, int64_t n_idx,
                int64_t row_elems, float* dst, int n_threads) {
  if (n_idx < 0 || row_elems <= 0) return -1;
  const size_t row_bytes = static_cast<size_t>(row_elems) * sizeof(float);
  parallel_for(n_idx, n_threads, [&](int64_t i) {
    std::memcpy(dst + i * row_elems, src + indices[i] * row_elems, row_bytes);
  });
  return 0;
}

// ABI/version probe for the ctypes loader.
int dmf_native_version() { return 1; }

}  // extern "C"
