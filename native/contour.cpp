// Native contour tracing for vaeplay_tpu — the host-side module replacing the
// reference's skimage.measure.find_contours + cv2.contourArea + resample trio
// (reference tools/utils.py:73-125, used inside BC/BCP forwards via
// find_tensor_contour, networks_BC.py:26-36).
//
// Marching squares at a given iso-level with linear edge interpolation,
// loop linking, largest-|area| selection (shoelace), reference-exact
// post-processing (round half-even → dedupe consecutive → drop closing
// point → flip to [x, y]) and the reference's decimation scheme.
//
// Exposed as a C ABI for ctypes; built by native/Makefile into
// libvaeplay_contour.so.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Pt {
  double r, c;
};

// quantized endpoint key for linking (crossings lie on a 1/1000 grid here)
static inline int64_t key_of(double r, double c, int w) {
  int64_t qr = (int64_t)llround(r * 1000.0);
  int64_t qc = (int64_t)llround(c * 1000.0);
  return qr * (int64_t)(w + 2) * 1000 + qc;
}

struct Segment {
  Pt a, b;
};

// Build marching-squares segments for one cell.  Corner bits:
// tl=1, tr=2, br=4, bl=8; "inside" = value >= level.
static void cell_segments(const float* img, int h, int w, int r, int c,
                          double level, std::vector<Segment>& segs) {
  double tl = img[r * w + c], tr = img[r * w + c + 1];
  double bl = img[(r + 1) * w + c], br = img[(r + 1) * w + c + 1];
  int idx = (tl >= level ? 1 : 0) | (tr >= level ? 2 : 0) |
            (br >= level ? 4 : 0) | (bl >= level ? 8 : 0);
  if (idx == 0 || idx == 15) return;

  auto interp = [&](double a, double b) {
    double d = b - a;
    if (std::fabs(d) < 1e-12) return 0.5;
    double t = (level - a) / d;
    return t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
  };
  Pt top{(double)r, c + interp(tl, tr)};
  Pt right{r + interp(tr, br), (double)c + 1};
  Pt bottom{(double)r + 1, c + interp(bl, br)};
  Pt left{r + interp(tl, bl), (double)c};

  auto add = [&](Pt a, Pt b) { segs.push_back({a, b}); };
  switch (idx) {
    case 1: add(left, top); break;
    case 2: add(top, right); break;
    case 3: add(left, right); break;
    case 4: add(right, bottom); break;
    case 5: {
      double center = (tl + tr + br + bl) / 4.0;
      if (center >= level) { add(left, bottom); add(top, right); }
      else { add(left, top); add(right, bottom); }
      break;
    }
    case 6: add(top, bottom); break;
    case 7: add(left, bottom); break;
    case 8: add(bottom, left); break;
    case 9: add(top, bottom); break;
    case 10: {
      double center = (tl + tr + br + bl) / 4.0;
      if (center >= level) { add(left, top); add(right, bottom); }
      else { add(left, bottom); add(top, right); }
      break;
    }
    case 11: add(bottom, right); break;
    case 12: add(right, left); break;
    case 13: add(top, right); break;
    case 14: add(left, top); break;
  }
}

// Link undirected segments into chains/loops; returns list of point paths.
static std::vector<std::vector<Pt>> link_segments(
    const std::vector<Segment>& segs, int w) {
  // adjacency: endpoint key → (segment idx, which end) pairs
  std::unordered_multimap<int64_t, std::pair<int, int>> adj;
  adj.reserve(segs.size() * 2);
  for (int i = 0; i < (int)segs.size(); ++i) {
    adj.emplace(key_of(segs[i].a.r, segs[i].a.c, w), std::make_pair(i, 0));
    adj.emplace(key_of(segs[i].b.r, segs[i].b.c, w), std::make_pair(i, 1));
  }
  std::vector<char> used(segs.size(), 0);
  std::vector<std::vector<Pt>> paths;

  for (int s = 0; s < (int)segs.size(); ++s) {
    if (used[s]) continue;
    used[s] = 1;
    std::vector<Pt> path{segs[s].a, segs[s].b};
    // extend forward from path.back()
    for (int dir = 0; dir < 2; ++dir) {
      bool extended = true;
      while (extended) {
        extended = false;
        Pt tip = dir == 0 ? path.back() : path.front();
        auto range = adj.equal_range(key_of(tip.r, tip.c, w));
        for (auto it = range.first; it != range.second; ++it) {
          int si = it->second.first, end = it->second.second;
          if (used[si]) continue;
          used[si] = 1;
          Pt nxt = end == 0 ? segs[si].b : segs[si].a;
          if (dir == 0) path.push_back(nxt);
          else path.insert(path.begin(), nxt);
          extended = true;
          break;
        }
      }
    }
    paths.push_back(std::move(path));
  }
  return paths;
}

static double shoelace_abs(const std::vector<Pt>& p) {
  double a = 0.0;
  size_t n = p.size();
  for (size_t i = 0; i + 1 < n; ++i)
    a += p[i].c * p[i + 1].r - p[i + 1].c * p[i].r;
  a += p[n - 1].c * p[0].r - p[0].c * p[n - 1].r;
  return std::fabs(a) * 0.5;
}

// python round() / np.round: round-half-even
static inline long round_half_even(double x) {
  double f = std::floor(x), d = x - f;
  if (d < 0.5) return (long)f;
  if (d > 0.5) return (long)f + 1;
  long lf = (long)f;
  return (lf % 2 == 0) ? lf : lf + 1;
}

}  // namespace

extern "C" {

// Trace the largest contour of img (h*w float32) at `level`, post-process as
// the reference does, decimate to <= max_points, write [x, y] float32 pairs
// into out_pts (capacity max_points*2).  Returns the point count (0 if none).
int vaeplay_find_largest_contour(const float* img, int h, int w, float level,
                                 int max_points, float* out_pts) {
  std::vector<Segment> segs;
  segs.reserve((size_t)h * 2);
  for (int r = 0; r < h - 1; ++r)
    for (int c = 0; c < w - 1; ++c) cell_segments(img, h, w, r, c, level, segs);
  if (segs.empty()) return 0;

  auto paths = link_segments(segs, w);
  // largest by |area| (tools/utils.py:74-86); single contour shortcut included
  int best = 0;
  double best_area = -1.0;
  for (int i = 0; i < (int)paths.size(); ++i) {
    if (paths[i].size() < 2) continue;
    double a = shoelace_abs(paths[i]);
    if (a > best_area) { best_area = a; best = i; }
  }
  const auto& contour = paths[best];

  // process_contour (tools/utils.py:87-100): round, dedupe consecutive,
  // drop the closing point
  std::vector<std::pair<long, long>> proc;  // (y=row, x=col)
  proc.reserve(contour.size());
  for (const auto& pt : contour) {
    long y = round_half_even(pt.r), x = round_half_even(pt.c);
    if (!proc.empty() && proc.back().first == y && proc.back().second == x)
      continue;
    proc.emplace_back(y, x);
  }
  if (proc.empty()) return 0;
  proc.pop_back();
  if (proc.empty()) return 0;

  long n = (long)proc.size();
  // resample_points (tools/utils.py:111-125)
  std::vector<long> select;
  if (n > max_points) {
    double step = (double)(n - 2) / (double)(max_points - 2);
    select.push_back(0);
    for (long i = 1; i <= max_points - 2; ++i) {
      double v = i * step;
      // np.round(v, 1) then int cast (truncation)
      double r1 = std::nearbyint(v * 10.0) / 10.0;
      select.push_back((long)r1);
    }
    select.push_back(n - 1);
  } else {
    for (long i = 0; i < n; ++i) select.push_back(i);
  }
  int count = (int)select.size();
  for (int i = 0; i < count; ++i) {
    // output flipped to [x, y] (tools/utils.py:108)
    out_pts[i * 2 + 0] = (float)proc[select[i]].second;
    out_pts[i * 2 + 1] = (float)proc[select[i]].first;
  }
  return count;
}

// Batched entry: imgs (b*h*w), per-image threshold then trace.
// out_pts: b*max_points*2, out_counts: b.
void vaeplay_batch_contours(const float* imgs, int b, int h, int w,
                            float threshold, float level, int max_points,
                            float* out_pts, int32_t* out_counts) {
  std::vector<float> binary((size_t)h * w);
  for (int i = 0; i < b; ++i) {
    const float* img = imgs + (size_t)i * h * w;
    for (size_t j = 0; j < (size_t)h * w; ++j)
      binary[j] = img[j] >= threshold ? 1.0f : 0.0f;
    std::memset(out_pts + (size_t)i * max_points * 2, 0,
                sizeof(float) * (size_t)max_points * 2);
    out_counts[i] = vaeplay_find_largest_contour(
        binary.data(), h, w, level, max_points,
        out_pts + (size_t)i * max_points * 2);
  }
}

}  // extern "C"
