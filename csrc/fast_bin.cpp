// Threaded bin assignment for the histogram GBDT (trees/binning.py).
//
// apply_bins_np's hot loop is a per-column np.searchsorted over ~450
// columns x ~14k rows; single-threaded numpy costs ~1.3 s per call in
// the adversarial stage. Here: upper_bound per element, rows split
// across threads (row-major iteration keeps X/out accesses sequential;
// the promoted edges table ~1 MB stays in L2). Semantics identical to
// the numpy path:
//   bin = #edges <= x after clipping x to [-1e10, 1e10]; NaN -> missing.
// Edges rows are inf-padded, which upper_bound handles naturally
// (finite x always lands before the padding).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// X: [n, f] float64 row-major; edges: [f, n_edges] float32 row-major;
// out: [n, f] int16 row-major (bin ids; NaN -> n_bins).
void apply_bins(const double* X, const float* edges, int64_t n, int64_t f,
                int64_t n_edges, int32_t n_bins, int16_t* out,
                int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  n_threads = static_cast<int32_t>(
      std::min<int64_t>(n_threads, std::max<int64_t>(n, 1)));

  // promote once: numpy compares float64 x against float32 edges
  // promoted to float64
  std::vector<double> e(static_cast<size_t>(f) * n_edges);
  for (int64_t k = 0; k < f * n_edges; ++k)
    e[k] = static_cast<double>(edges[k]);

  auto work = [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      const double* xi = X + i * f;
      int16_t* oi = out + i * f;
      for (int64_t j = 0; j < f; ++j) {
        double x = xi[j];
        if (std::isnan(x)) {
          oi[j] = static_cast<int16_t>(n_bins);
          continue;
        }
        x = std::min(std::max(x, -1e10), 1e10);
        const double* ej = e.data() + j * n_edges;
        oi[j] = static_cast<int16_t>(
            std::upper_bound(ej, ej + n_edges, x) - ej);
      }
    }
  };

  std::vector<std::thread> threads;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t i0 = t * per, i1 = std::min(n, i0 + per);
    if (i0 >= i1) break;
    threads.emplace_back(work, i0, i1);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
