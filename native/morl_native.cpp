// morl_native — host-side native kernels for morl-baselines-tpu.
//
// The reference framework (LucasAlegre/morl-baselines) is pure Python and
// outsources exact hypervolume to pymoo (common/performance_indicators.py:15)
// and Pareto pruning to numpy/scipy (common/pareto.py:34-93).  In this
// framework everything per-step runs on TPU under XLA; the remaining heavy
// HOST-side math — exact hypervolume of logged fronts and non-dominated
// filtering of large archives — lives here as a small C/C++ library bound via
// ctypes (morl_baselines_tpu/utils/native.py), with a numpy fallback when the
// shared object is unavailable.
//
// Conventions: MAXIMIZATION everywhere; points are row-major (n, d) doubles;
// hypervolume is the Lebesgue measure of the union of boxes [ref, p].
//
// Build: `make -C native` → libmorl_native.so (see native/Makefile).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Pareto dominance utilities
// ---------------------------------------------------------------------------

// a dominates b  (>= everywhere, > somewhere)
inline bool dominates(const double* a, const double* b, int d) {
  bool strict = false;
  for (int k = 0; k < d; ++k) {
    if (a[k] < b[k]) return false;
    if (a[k] > b[k]) strict = true;
  }
  return strict;
}

// Flat (n, d) point set with O(n^2 d) in-place non-dominated compaction.
struct PointSet {
  std::vector<double> data;
  int n = 0;
  int d = 0;

  const double* row(int i) const { return data.data() + (size_t)i * d; }
  double* row(int i) { return data.data() + (size_t)i * d; }

  void prune() {
    std::vector<char> keep(n, 1);
    for (int i = 0; i < n; ++i) {
      if (!keep[i]) continue;
      for (int j = 0; j < n; ++j) {
        if (j == i || !keep[j]) continue;
        if (dominates(row(j), row(i), d)) {
          keep[i] = 0;
          break;
        }
        // drop exact duplicates (keep lowest index) — they add no volume
        if (j < i && std::memcmp(row(j), row(i), d * sizeof(double)) == 0) {
          keep[i] = 0;
          break;
        }
      }
    }
    int w = 0;
    for (int i = 0; i < n; ++i) {
      if (keep[i]) {
        if (w != i) std::memmove(row(w), row(i), d * sizeof(double));
        ++w;
      }
    }
    n = w;
  }

  // sort rows descending by objective 0 (improves WFG limit-set pruning)
  void sort_desc_first() {
    std::vector<int> idx(n);
    for (int i = 0; i < n; ++i) idx[i] = i;
    std::stable_sort(idx.begin(), idx.end(),
                     [&](int a, int b) { return row(a)[0] > row(b)[0]; });
    std::vector<double> out((size_t)n * d);
    for (int i = 0; i < n; ++i)
      std::memcpy(out.data() + (size_t)i * d, row(idx[i]), d * sizeof(double));
    data.swap(out);
  }
};

// ---------------------------------------------------------------------------
// Hypervolume
// ---------------------------------------------------------------------------

// Exact 2-D staircase on a pruned, x-descending point set.
double hv2d(const PointSet& p, const double* ref) {
  // copy + sort descending by x
  std::vector<std::pair<double, double>> q(p.n);
  for (int i = 0; i < p.n; ++i) q[i] = {p.row(i)[0], p.row(i)[1]};
  std::sort(q.begin(), q.end(),
            [](auto& a, auto& b) { return a.first > b.first; });
  double total = 0.0, ymax = ref[1];
  for (auto& [x, y] : q) {
    if (y > ymax) {
      total += (x - ref[0]) * (y - ymax);
      ymax = y;
    }
  }
  return total;
}

double inclhv(const double* p, const double* ref, int d) {
  double v = 1.0;
  for (int k = 0; k < d; ++k) v *= p[k] - ref[k];
  return v;
}

// WFG exclusive-volume recursion (Walking Fish Group algorithm, the same
// scheme pymoo's exact HV uses).  `pts` must be pruned.
double hv_rec(PointSet& pts, const double* ref) {
  if (pts.n == 0) return 0.0;
  if (pts.n == 1) return inclhv(pts.row(0), ref, pts.d);
  if (pts.d == 2) return hv2d(pts, ref);
  pts.sort_desc_first();
  double total = 0.0;
  for (int i = 0; i < pts.n; ++i) {
    // limit set: later points clipped under point i
    PointSet lim;
    lim.d = pts.d;
    lim.n = pts.n - i - 1;
    lim.data.resize((size_t)lim.n * lim.d);
    for (int j = 0; j < lim.n; ++j) {
      const double* src = pts.row(i + 1 + j);
      const double* cap = pts.row(i);
      double* dst = lim.row(j);
      for (int k = 0; k < lim.d; ++k) dst[k] = std::min(src[k], cap[k]);
    }
    // drop limit points with no volume above ref
    int w = 0;
    for (int j = 0; j < lim.n; ++j) {
      bool pos = true;
      for (int k = 0; k < lim.d; ++k)
        if (lim.row(j)[k] <= ref[k]) {
          pos = false;
          break;
        }
      if (pos) {
        if (w != j) std::memmove(lim.row(w), lim.row(j), lim.d * sizeof(double));
        ++w;
      }
    }
    lim.n = w;
    lim.prune();
    total += inclhv(pts.row(i), ref, pts.d) - hv_rec(lim, ref);
  }
  return total;
}

}  // namespace

extern "C" {

// Exact hypervolume (maximization) of `pts` (n x d, row-major) w.r.t. `ref`.
// Points are clipped to the ref box; dominated/zero-volume points contribute
// nothing.  Mirrors morl_baselines_tpu.core.indicators._hv_wfg semantics.
double morl_hv_exact(const double* pts, int64_t n, int32_t d, const double* ref) {
  if (n <= 0 || d <= 0) return 0.0;
  if (d > 64) return -1.0;  // caller falls back to Python
  PointSet p;
  p.d = d;
  p.n = 0;
  p.data.reserve((size_t)n * d);
  for (int64_t i = 0; i < n; ++i) {
    // clip to ref box; keep only points with strictly positive volume
    double tmp[64];
    bool pos = true;
    for (int k = 0; k < d; ++k) {
      double v = std::max(pts[i * d + k], ref[k]);
      tmp[k] = v;
      if (v <= ref[k]) pos = false;
    }
    if (pos) {
      p.data.insert(p.data.end(), tmp, tmp + d);
      ++p.n;
    }
  }
  p.prune();
  return hv_rec(p, ref);
}

// Non-dominated mask: mask_out[i] = 1 iff row i is Pareto-non-dominated
// (maximization; duplicates all kept, as reference pareto.py:34-57).
// Returns the number of non-dominated rows.
int64_t morl_pareto_mask(const double* pts, int64_t n, int32_t d,
                         uint8_t* mask_out) {
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    bool dominated = false;
    for (int64_t j = 0; j < n && !dominated; ++j) {
      if (j == i) continue;
      dominated = dominates(pts + j * d, pts + i * d, d);
    }
    mask_out[i] = dominated ? 0 : 1;
    count += !dominated;
  }
  return count;
}

// Batched exact hypervolume: `b` fronts each of `n` points; out[b].
void morl_hv_exact_batch(const double* pts, int64_t b, int64_t n, int32_t d,
                         const double* ref, double* out) {
  for (int64_t i = 0; i < b; ++i)
    out[i] = morl_hv_exact(pts + i * n * d, n, d, ref);
}

}  // extern "C"
