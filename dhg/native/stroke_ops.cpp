// Native stroke-preprocessing kernels for the offline IAM data build.
//
// The dataset build runs combine_strokes (pairwise collinear merge +
// re-normalization, reference utils/io.py:118-147) three times per line over
// ~10k lines; this is the CPU hot loop of cache construction. The Python
// path (dhg/data/strokes.py) stays as the reference implementation and
// fallback; this library is selected via ctypes when built
// (dhg/native/__init__.py).
//
// Tie-breaking note: pair-merge candidates are chosen by std::stable_sort on
// the collinearity cost; the Python path uses np.argsort(kind="stable") so
// both paths produce bit-identical merge choices.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

double std_xy(const double* xyz, int64_t n) {
  // Population std over BOTH delta channels, two-pass like np.std on the
  // flattened [n, 2] view.
  const int64_t m = 2 * n;
  double sum = 0.0;
  for (int64_t i = 0; i < n; ++i) sum += xyz[3 * i] + xyz[3 * i + 1];
  const double mean = sum / static_cast<double>(m);
  double ss = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double dx = xyz[3 * i] - mean;
    const double dy = xyz[3 * i + 1] - mean;
    ss += dx * dx + dy * dy;
  }
  return std::sqrt(ss / static_cast<double>(m));
}

// One combine pass: merge the n_merge lowest-cost (even, odd) consecutive
// pairs, OR the pen-lift bits, delete the odd rows, renormalize by std.
int64_t combine_pass(std::vector<double>& xyz, int64_t n, int64_t n_merge) {
  const int64_t pairs = n / 2;
  if (n_merge > pairs) n_merge = pairs;

  std::vector<double> cost(pairs);
  for (int64_t p = 0; p < pairs; ++p) {
    const double ax = xyz[3 * (2 * p)], ay = xyz[3 * (2 * p) + 1];
    const double bx = xyz[3 * (2 * p + 1)], by = xyz[3 * (2 * p + 1) + 1];
    cost[p] = std::sqrt(ax * ax + ay * ay) + std::sqrt(bx * bx + by * by) -
              std::sqrt((ax + bx) * (ax + bx) + (ay + by) * (ay + by));
  }

  std::vector<int64_t> order(pairs);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return cost[a] < cost[b]; });

  std::vector<uint8_t> merge(pairs, 0);
  for (int64_t i = 0; i < n_merge; ++i) merge[order[i]] = 1;

  // Merge in place, then compact (delete the odd row of merged pairs).
  std::vector<double> out;
  out.reserve(3 * n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = i / 2;
    if (i % 2 == 0 && p < pairs && merge[p]) {
      const double mx = xyz[3 * i] + xyz[3 * (i + 1)];
      const double my = xyz[3 * i + 1] + xyz[3 * (i + 1) + 1];
      const double pen = (xyz[3 * i + 2] + xyz[3 * (i + 1) + 2]) > 0.0 ? 1.0 : 0.0;
      out.push_back(mx);
      out.push_back(my);
      out.push_back(pen);
      ++i;  // skip the merged odd row
    } else {
      out.push_back(xyz[3 * i]);
      out.push_back(xyz[3 * i + 1]);
      out.push_back(xyz[3 * i + 2]);
    }
  }

  const int64_t n_out = static_cast<int64_t>(out.size()) / 3;
  const double s = std_xy(out.data(), n_out);
  if (s > 0.0) {
    for (int64_t i = 0; i < n_out; ++i) {
      out[3 * i] /= s;
      out[3 * i + 1] /= s;
    }
  }
  xyz.assign(out.begin(), out.end());
  return n_out;
}

}  // namespace

extern "C" {

// Full simplification pipeline on a [n, 3] row-major (dx, dy, pen) array:
// `passes` combine passes, each merging floor(frac * current_n) pairs.
// Writes at most n rows to `out` (simplification only shrinks); returns the
// output row count.
int64_t dhg_simplify_strokes(const double* xyz_in, int64_t n, int64_t passes,
                             double frac, double* out) {
  std::vector<double> xyz(xyz_in, xyz_in + 3 * n);
  int64_t cur = n;
  for (int64_t p = 0; p < passes; ++p) {
    const int64_t n_merge = static_cast<int64_t>(static_cast<double>(cur) * frac);
    cur = combine_pass(xyz, cur, n_merge);
  }
  std::memcpy(out, xyz.data(), sizeof(double) * 3 * cur);
  return cur;
}

// One combine pass (exposed for parity tests against the Python reference).
int64_t dhg_combine_strokes(const double* xyz_in, int64_t n, int64_t n_merge,
                            double* out) {
  std::vector<double> xyz(xyz_in, xyz_in + 3 * n);
  const int64_t cur = combine_pass(xyz, n, n_merge);
  std::memcpy(out, xyz.data(), sizeof(double) * 3 * cur);
  return cur;
}

}  // extern "C"
