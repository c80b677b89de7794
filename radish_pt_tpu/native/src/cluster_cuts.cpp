// Area-optimal culling-cluster segmentation (windowed DP) — native twin of
// scene/build.py::_cluster_cuts.  The DP recurrence is sequential in the
// triangle index, which caps the numpy version at ~0.7 ms per position
// (python dispatch over small arrays; 2.9 s at 112k triangles with 512-tri
// windows); this C++ loop runs the same exact DP in ~0.1 s.
//
// cost[i+1] = min over k < min(sub, i+1) of
//               cost[i-k] + area(AABB of tris (i-k .. i)) + lambda
// with running window min/max for the segment boxes.  Cuts are forced at
// `chunk` boundaries exactly like the numpy path so results are
// interchangeable (tests assert equality).

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cmath>
#include <limits>

namespace {

inline float box_area(const float lo[3], const float hi[3]) {
  float dx = hi[0] - lo[0], dy = hi[1] - lo[1], dz = hi[2] - lo[2];
  return 2.0f * (dx * dy + dy * dz + dz * dx);
}

}  // namespace

extern "C" {

// pmin/pmax: [T, 3] f32 row-major; cuts_out must hold T + 1 entries.
// Returns the number of cut positions written (n_segments + 1).
int64_t radish_cluster_cuts(const float* pmin, const float* pmax, int64_t T,
                            int64_t sub, float lam, int64_t chunk,
                            int64_t* cuts_out) {
  if (T <= 0) return 0;
  const float kInf = std::numeric_limits<float>::infinity();

  std::vector<int64_t> rev_cuts;  // global cut positions, reversed
  rev_cuts.push_back(T);

  std::vector<float> cost;     // [len + 1]
  std::vector<int64_t> back;   // [len + 1] segment start within the chunk
  std::vector<float> lo, hi;   // running window boxes, [win][3] ring

  for (int64_t base = 0; base < T; base += chunk) {
    const int64_t len = std::min(chunk, T - base);
    cost.assign(len + 1, 0.0f);
    back.assign(len + 1, 0);
    // window ring: slot k holds the box of segment starting at i - k
    const int64_t win = std::min(sub, len);
    lo.assign(win * 3, kInf);
    hi.assign(win * 3, -kInf);

    for (int64_t i = 0; i < len; ++i) {
      const float* tmin = pmin + (base + i) * 3;
      const float* tmax = pmax + (base + i) * 3;
      const int64_t kmax = std::min(sub, i + 1);
      // grow every active window box by triangle i
      for (int64_t k = 0; k < kmax; ++k) {
        float* l = lo.data() + k * 3;
        float* h = hi.data() + k * 3;
        l[0] = std::min(l[0], tmin[0]);
        l[1] = std::min(l[1], tmin[1]);
        l[2] = std::min(l[2], tmin[2]);
        h[0] = std::max(h[0], tmax[0]);
        h[1] = std::max(h[1], tmax[1]);
        h[2] = std::max(h[2], tmax[2]);
      }
      float best = kInf;
      int64_t best_start = i;
      for (int64_t k = 0; k < kmax; ++k) {
        const float c =
            cost[i - k] + box_area(lo.data() + k * 3, hi.data() + k * 3) + lam;
        if (c < best) {
          best = c;
          best_start = i - k;
        }
      }
      cost[i + 1] = best;
      back[i + 1] = best_start;
      // shift the ring: segment-start slots move one up for the next i;
      // slot 0 becomes the fresh single-triangle segment.  Bound by the
      // ALLOCATED window (win = min(sub, len)), not by sub: a chunk
      // shorter than sub allocates only len slots.
      const int64_t wlim = std::min(win, i + 2);
      for (int64_t k = wlim - 1; k >= 1; --k) {
        std::copy_n(lo.data() + (k - 1) * 3, 3, lo.data() + k * 3);
        std::copy_n(hi.data() + (k - 1) * 3, 3, hi.data() + k * 3);
      }
      lo[0] = kInf; lo[1] = kInf; lo[2] = kInf;
      hi[0] = -kInf; hi[1] = -kInf; hi[2] = -kInf;
    }

    // backtrack this chunk (global positions, descending)
    int64_t i = len;
    while (i > 0) {
      const int64_t s = back[i];
      if (base + i != T) rev_cuts.push_back(base + i);
      i = s;
    }
  }

  rev_cuts.push_back(0);
  std::sort(rev_cuts.begin(), rev_cuts.end());
  rev_cuts.erase(std::unique(rev_cuts.begin(), rev_cuts.end()),
                 rev_cuts.end());
  for (size_t j = 0; j < rev_cuts.size(); ++j) cuts_out[j] = rev_cuts[j];
  return static_cast<int64_t>(rev_cuts.size());
}

}  // extern "C"
