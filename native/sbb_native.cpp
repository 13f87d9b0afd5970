// Native host-side geometry/runtime ops for the TPU textline framework.
//
// The reference delegates its host geometry to OpenCV's C++ core
// (cv2.findContours/fillPoly/erode/dilate/pointPolygonTest — see SURVEY.md
// §2.3); this library owns the same surface for our pipeline. The Python
// implementations in sbb_textline_detection_tpu/ops/contours.py and
// ops/morphology.py are the behavioral oracles: every function here has a
// parity test against them (tests/test_native.py).
//
// Build: `make -C native` -> libsbbnative.so, loaded via ctypes
// (sbb_textline_detection_tpu/native_bridge.py) with graceful fallback.
//
// C ABI only — no pybind11 in this environment.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

// ---------------------------------------------------------------------------
// Moore boundary tracing (parity with ops/contours.py::_trace_moore).
// mask: (h, w) uint8 crop of ONE component; (sy, sx) its row-major-first
// foreground pixel. Writes (x, y) int64 pairs into out_xy (capacity max_pts).
// Returns the number of points, or -1 if capacity was exceeded.
// ---------------------------------------------------------------------------

static const int MOORE_DX[8] = {-1, -1, 0, 1, 1, 1, 0, -1};
static const int MOORE_DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};

template <typename FG>
static int64_t trace_moore_impl(FG fg, int64_t h, int64_t w,
                                int64_t sy, int64_t sx,
                                int64_t* out_xy, int64_t max_pts) {
  // Visited state = (pixel, backtrack dir): 8 bits per pixel.
  std::vector<uint8_t> seen(static_cast<size_t>(h) * w, 0);

  int64_t px = sx, py = sy;
  int b = 0;  // backtrack points West (background by row-major scan order)
  int64_t n = 0;
  if (max_pts < 1) return -1;
  out_xy[0] = px;
  out_xy[1] = py;
  n = 1;
  seen[py * w + px] |= (1u << b);

  for (;;) {
    int found = -1, prev = b;
    for (int k = 1; k <= 8; ++k) {
      int d = (b + k) & 7;
      if (fg(py + MOORE_DY[d], px + MOORE_DX[d])) {
        found = d;
        prev = (b + k - 1) & 7;
        break;
      }
    }
    if (found < 0) break;  // isolated pixel
    int64_t bgx = px + MOORE_DX[prev];
    int64_t bgy = py + MOORE_DY[prev];
    px += MOORE_DX[found];
    py += MOORE_DY[found];
    int ddx = static_cast<int>(bgx - px);
    int ddy = static_cast<int>(bgy - py);
    int nb = 0;
    for (int d = 0; d < 8; ++d) {
      if (MOORE_DX[d] == ddx && MOORE_DY[d] == ddy) { nb = d; break; }
    }
    b = nb;
    uint8_t bit = static_cast<uint8_t>(1u << b);
    uint8_t& cell = seen[py * w + px];
    if (cell & bit) break;  // first repeated (pixel, backtrack) closes the loop
    cell |= bit;
    if (n >= max_pts) return -1;
    out_xy[2 * n] = px;
    out_xy[2 * n + 1] = py;
    ++n;
  }
  return n;
}

extern "C" {

int64_t sbb_trace_moore(const uint8_t* mask, int64_t h, int64_t w,
                        int64_t sy, int64_t sx,
                        int64_t* out_xy, int64_t max_pts) {
  auto fg = [&](int64_t y, int64_t x) -> bool {
    return y >= 0 && y < h && x >= 0 && x < w && mask[y * w + x] != 0;
  };
  return trace_moore_impl(fg, h, w, sy, sx, out_xy, max_pts);
}

// Trace a component's boundary DIRECTLY in the (full-size) int32 label map:
// the (h, w) window at (y0, x0) of a row-stride `stride` map, foreground =
// (label == li). Spares the caller the per-component `crop == li`
// materialization (1-2 ms for a full text region). Output coordinates are
// window-relative, like sbb_trace_moore on the crop.
int64_t sbb_trace_moore_label(const int32_t* labels, int64_t stride,
                              int64_t y0, int64_t x0, int64_t h, int64_t w,
                              int64_t sy, int64_t sx, int32_t li,
                              int64_t* out_xy, int64_t max_pts) {
  auto fg = [&](int64_t y, int64_t x) -> bool {
    return y >= 0 && y < h && x >= 0 && x < w &&
           labels[(y0 + y) * stride + (x0 + x)] == li;
  };
  return trace_moore_impl(fg, h, w, sy, sx, out_xy, max_pts);
}

// ---------------------------------------------------------------------------
// 8-connected component labeling (parity with scipy.ndimage.label on an
// 8-connected structure): two-pass union-find. labels: (h, w) int32 out,
// 0 = background, components numbered 1..n in row-major first-pixel order.
// Returns n.
// ---------------------------------------------------------------------------

static int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

int64_t sbb_label_components(const uint8_t* mask, int64_t h, int64_t w,
                             int32_t* labels) {
  std::vector<int32_t> parent(1, 0);  // parent[0] unused
  // First pass: provisional labels, merging with W, NW, N, NE neighbors.
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      if (!mask[y * w + x]) { labels[y * w + x] = 0; continue; }
      int32_t neigh[4];
      int cnt = 0;
      if (x > 0 && labels[y * w + x - 1]) neigh[cnt++] = labels[y * w + x - 1];
      if (y > 0) {
        const int64_t r = (y - 1) * w;
        if (x > 0 && labels[r + x - 1]) neigh[cnt++] = labels[r + x - 1];
        if (labels[r + x]) neigh[cnt++] = labels[r + x];
        if (x + 1 < w && labels[r + x + 1]) neigh[cnt++] = labels[r + x + 1];
      }
      if (cnt == 0) {
        int32_t nl = static_cast<int32_t>(parent.size());
        parent.push_back(nl);
        labels[y * w + x] = nl;
      } else {
        int32_t m = neigh[0];
        for (int i = 1; i < cnt; ++i) m = std::min(m, neigh[i]);
        labels[y * w + x] = m;
        for (int i = 0; i < cnt; ++i) {
          int32_t ra = uf_find(parent, m), rb = uf_find(parent, neigh[i]);
          if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
        }
      }
    }
  }
  // Second pass: compress + renumber in row-major first-appearance order.
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next_label = 0;
  for (int64_t i = 0; i < h * w; ++i) {
    if (!labels[i]) continue;
    int32_t root = uf_find(parent, labels[i]);
    if (!remap[root]) remap[root] = ++next_label;
    labels[i] = remap[root];
  }
  return next_label;
}

// ---------------------------------------------------------------------------
// Per-label reductions over a label map: bounding boxes (x0, y0, x1, y1
// inclusive) and row-major-first seed pixel per label. boxes: (n, 4) int64;
// seeds: (n, 2) int64 as (y, x). Labels are 1..n.
// ---------------------------------------------------------------------------

void sbb_label_stats(const int32_t* labels, int64_t h, int64_t w, int64_t n,
                     int64_t* boxes, int64_t* seeds) {
  for (int64_t i = 0; i < n; ++i) {
    boxes[i * 4 + 0] = w;  boxes[i * 4 + 1] = h;
    boxes[i * 4 + 2] = -1; boxes[i * 4 + 3] = -1;
    seeds[i * 2 + 0] = -1; seeds[i * 2 + 1] = -1;
  }
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      int32_t l = labels[y * w + x];
      if (l <= 0 || l > n) continue;
      int64_t* b = boxes + (l - 1) * 4;
      if (x < b[0]) b[0] = x;
      if (y < b[1]) b[1] = y;
      if (x > b[2]) b[2] = x;
      if (y > b[3]) b[3] = y;
      int64_t* s = seeds + (l - 1) * 2;
      if (s[0] < 0) { s[0] = y; s[1] = x; }
    }
  }
}

// ---------------------------------------------------------------------------
// Even-odd scanline polygon fill + boundary (parity with
// ops/contours.py::fill_polygon). pts: (n, 2) float64 (x, y).
// ---------------------------------------------------------------------------

void sbb_fill_polygon(const double* pts, int64_t n, int64_t h, int64_t w,
                      uint8_t* mask) {
  std::memset(mask, 0, static_cast<size_t>(h) * w);
  if (n == 0) return;
  if (n < 3) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t x = static_cast<int64_t>(pts[2 * i]);
      int64_t y = static_cast<int64_t>(pts[2 * i + 1]);
      if (y >= 0 && y < h && x >= 0 && x < w) mask[y * w + x] = 1;
    }
    return;
  }
  double ymin_f = pts[1], ymax_f = pts[1];
  for (int64_t i = 1; i < n; ++i) {
    ymin_f = std::min(ymin_f, pts[2 * i + 1]);
    ymax_f = std::max(ymax_f, pts[2 * i + 1]);
  }
  int64_t ymin = std::max<int64_t>(static_cast<int64_t>(std::floor(ymin_f)), 0);
  int64_t ymax = std::min<int64_t>(static_cast<int64_t>(std::ceil(ymax_f)), h - 1);
  std::vector<double> xs;
  for (int64_t y = ymin; y <= ymax; ++y) {
    xs.clear();
    for (int64_t i = 0; i < n; ++i) {
      double x1 = pts[2 * i], y1 = pts[2 * i + 1];
      double x2 = pts[2 * ((i + 1) % n)], y2 = pts[2 * ((i + 1) % n) + 1];
      if ((y1 <= y) != (y2 <= y)) {
        xs.push_back(x1 + (y - y1) * (x2 - x1) / (y2 - y1));
      }
    }
    if (xs.empty()) continue;
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int64_t a = std::max<int64_t>(static_cast<int64_t>(std::ceil(xs[k])), 0);
      int64_t b = std::min<int64_t>(static_cast<int64_t>(std::floor(xs[k + 1])),
                                    w - 1);
      if (a <= b) std::memset(mask + y * w + a, 1, static_cast<size_t>(b - a + 1));
    }
  }
  // Boundary pixels (matches _draw_boundary: linspace-rounded segments).
  for (int64_t i = 0; i < n; ++i) {
    double x0 = pts[2 * i], y0 = pts[2 * i + 1];
    double x1 = pts[2 * ((i + 1) % n)], y1 = pts[2 * ((i + 1) % n) + 1];
    int64_t steps =
        static_cast<int64_t>(std::max(std::abs(x1 - x0), std::abs(y1 - y0))) + 1;
    // Bit-for-bit np.linspace: value = s*step + start (and endpoint = stop),
    // then nearbyint = numpy's round-half-to-even. Any other association
    // differs by 1 ulp at exact .5 midpoints and flips the rounding.
    double xstep = steps > 1 ? (x1 - x0) / (steps - 1) : 0.0;
    double ystep = steps > 1 ? (y1 - y0) / (steps - 1) : 0.0;
    for (int64_t s = 0; s < steps; ++s) {
      double xv = (s == steps - 1) ? x1 : static_cast<double>(s) * xstep + x0;
      double yv = (s == steps - 1) ? y1 : static_cast<double>(s) * ystep + y0;
      int64_t x = static_cast<int64_t>(std::nearbyint(xv));
      int64_t y = static_cast<int64_t>(std::nearbyint(yv));
      if (y >= 0 && y < h && x >= 0 && x < w) mask[y * w + x] = 1;
    }
  }
}

// ---------------------------------------------------------------------------
// Rectangular-kernel binary erode/dilate, iterated. Van Herk sliding min/max
// per axis: O(hw) per iteration independent of kernel size. Iterating an
// erosion n times with a k-kernel equals one pass with (n(k-1)+1), so we do
// one separable pass. Border semantics: cv2-style constant border
// (0 for dilate, 1 for erode outside the image).
// ---------------------------------------------------------------------------

static void running_minmax_1d(const uint8_t* in, uint8_t* out, int64_t len,
                              int64_t stride, int64_t radius, bool is_max,
                              uint8_t border) {
  // Simple two-pointer deque-free approach for binary data: prefix runs.
  // For binary masks a windowed max is "any 1 in window"; min is "all 1".
  // Track the index of the last 1 (for max) / last 0 (for min).
  int64_t last = -(radius + len + 2);
  const uint8_t target = is_max ? 1 : 0;
  // Preload positions < 0 as border value.
  if (border == target) last = -1;  // border cells count as target just off the edge
  // Prescan the initial window body [0, radius-1]; the main loop's lead
  // pointer starts at i + radius and would never visit these.
  for (int64_t j = 0; j < std::min(radius, len); ++j) {
    if (in[j * stride] == target) last = j;
  }
  // We scan with a lead pointer at i + radius.
  for (int64_t i = 0; i < len; ++i) {
    int64_t lead = i + radius;
    if (lead < len) {
      if (in[lead * stride] == target) last = lead;
    } else if (border == target) {
      last = lead;  // border beyond the end counts as target
    }
    // Window covers [i - radius, i + radius]; validity of 'last':
    if (last >= i - radius) {
      out[i * stride] = is_max ? 1 : 0;
    } else {
      out[i * stride] = is_max ? 0 : 1;
    }
  }
}

void sbb_morph_binary(const uint8_t* in, int64_t h, int64_t w,
                      int64_t kernel, int64_t iterations, int is_dilate,
                      uint8_t* out) {
  int64_t radius = (iterations * (kernel - 1)) / 2;
  if (radius == 0) { std::memcpy(out, in, static_cast<size_t>(h) * w); return; }
  uint8_t border = is_dilate ? 0 : 1;
  std::vector<uint8_t> tmp(static_cast<size_t>(h) * w);
  // rows
  for (int64_t y = 0; y < h; ++y) {
    running_minmax_1d(in + y * w, tmp.data() + y * w, w, 1, radius,
                      is_dilate != 0, border);
  }
  // cols
  for (int64_t x = 0; x < w; ++x) {
    running_minmax_1d(tmp.data() + x, out + x, h, w, radius,
                      is_dilate != 0, border);
  }
}

// ---------------------------------------------------------------------------
// Center rotation (cv2.getRotationMatrix2D + warpAffine equivalent):
// inverse-map sampling about (w//2, h//2), BORDER_REPLICATE, float64.
// order: 0 = nearest, 1 = bilinear, 3 = Keys bicubic (A = -0.75) — the
// reference uses INTER_CUBIC (main.py:159-163 upstream). Parity oracle:
// ops/rotate.py::rotate_image_host. in/out: (h, w, c) float64, c channels
// interleaved last.
// ---------------------------------------------------------------------------

static inline void cubic_w(double f, double* w) {
  const double A = -0.75;
  double x;
  x = 1.0 + f; w[0] = ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A;
  x = f;       w[1] = ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0;
  x = 1.0 - f; w[2] = ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0;
  x = 2.0 - f; w[3] = ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A;
}

void sbb_rotate(const double* in, int64_t h, int64_t w, int64_t c,
                double angle_deg, int order, double* out) {
  const double cx = static_cast<double>(w / 2);
  const double cy = static_cast<double>(h / 2);
  const double rad = angle_deg * 3.14159265358979323846 / 180.0;
  const double a = std::cos(rad), b = std::sin(rad);
  auto clampi = [](int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  for (int64_t y = 0; y < h; ++y) {
    const double dy = static_cast<double>(y) - cy;
    for (int64_t x = 0; x < w; ++x) {
      const double dx = static_cast<double>(x) - cx;
      const double sx = a * dx - b * dy + cx;
      const double sy = b * dx + a * dy + cy;
      double* o = out + (y * w + x) * c;
      if (order == 0) {
        int64_t iy = clampi(static_cast<int64_t>(std::nearbyint(sy)), 0, h - 1);
        int64_t ix = clampi(static_cast<int64_t>(std::nearbyint(sx)), 0, w - 1);
        const double* p = in + (iy * w + ix) * c;
        for (int64_t k = 0; k < c; ++k) o[k] = p[k];
      } else if (order == 1) {
        double fy0 = std::floor(sy), fx0 = std::floor(sx);
        double fy = sy - fy0, fx = sx - fx0;
        int64_t iy = static_cast<int64_t>(fy0), ix = static_cast<int64_t>(fx0);
        int64_t y0c = clampi(iy, 0, h - 1), y1c = clampi(iy + 1, 0, h - 1);
        int64_t x0c = clampi(ix, 0, w - 1), x1c = clampi(ix + 1, 0, w - 1);
        for (int64_t k = 0; k < c; ++k) {
          double v00 = in[(y0c * w + x0c) * c + k];
          double v01 = in[(y0c * w + x1c) * c + k];
          double v10 = in[(y1c * w + x0c) * c + k];
          double v11 = in[(y1c * w + x1c) * c + k];
          o[k] = (v00 * (1 - fx) + v01 * fx) * (1 - fy) +
                 (v10 * (1 - fx) + v11 * fx) * fy;
        }
      } else {  // bicubic
        double fy0 = std::floor(sy), fx0 = std::floor(sx);
        double fy = sy - fy0, fx = sx - fx0;
        int64_t iy = static_cast<int64_t>(fy0), ix = static_cast<int64_t>(fx0);
        double wy[4], wx[4];
        cubic_w(fy, wy);
        cubic_w(fx, wx);
        int64_t ys[4], xs2[4];
        for (int t = 0; t < 4; ++t) {
          ys[t] = clampi(iy - 1 + t, 0, h - 1);
          xs2[t] = clampi(ix - 1 + t, 0, w - 1);
        }
        for (int64_t k = 0; k < c; ++k) {
          double acc = 0.0;
          for (int t = 0; t < 4; ++t) {
            const double* rowp = in + ys[t] * w * c;
            double rowv = wx[0] * rowp[xs2[0] * c + k] +
                          wx[1] * rowp[xs2[1] * c + k] +
                          wx[2] * rowp[xs2[2] * c + k] +
                          wx[3] * rowp[xs2[3] * c + k];
            acc += wy[t] * rowv;
          }
          o[k] = acc;
        }
      }
    }
  }
}



// ---------------------------------------------------------------------------
// Run-length 8-connected labeling + per-label stats in ONE pass.
// Equivalent to sbb_label_components followed by sbb_label_stats, but scans
// runs instead of pixels: text masks have ~100x fewer runs than pixels, and
// the fill uses std::fill per run. labels: (h, w) int32 out. boxes: (cap, 4)
// int64 (x0, y0, x1, y1 inclusive); seeds: (cap, 2) int64 (y, x). Returns n
// (components, numbered 1..n in row-major first-pixel order); if n > cap the
// labels are still complete but boxes/seeds are not — the return value is
// -n and the caller must retry stats with a larger buffer.
// ---------------------------------------------------------------------------

int64_t sbb_label_runs(const uint8_t* mask, int64_t h, int64_t w,
                       int32_t* labels, int64_t cap,
                       int64_t* boxes, int64_t* seeds) {
  struct Run { int32_t y; int32_t x0, x1; int32_t lab; };
  std::vector<Run> all;
  std::vector<int32_t> parent(1, 0);
  size_t prev_begin = 0, prev_end = 0;  // [prev_begin, prev_end) in `all`

  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = mask + y * w;
    size_t cur_begin = all.size();
    int64_t x = 0;
    while (x < w) {
      // skip background, 8 bytes at a time
      while (x + 8 <= w) {
        uint64_t v;
        std::memcpy(&v, row + x, 8);
        if (v) break;
        x += 8;
      }
      while (x < w && !row[x]) ++x;
      if (x >= w) break;
      int64_t x0 = x;
      while (x + 8 <= w) {
        uint64_t v;
        std::memcpy(&v, row + x, 8);
        if (v != 0x0101010101010101ull && ~v != 0ull) {
          // mixed word with a zero byte only if some byte==0
          bool all_fg = true;
          for (int i = 0; i < 8; ++i) if (!row[x + i]) { all_fg = false; break; }
          if (!all_fg) break;
        }
        x += 8;
      }
      while (x < w && row[x]) ++x;
      Run r{static_cast<int32_t>(y), static_cast<int32_t>(x0),
            static_cast<int32_t>(x - 1), 0};
      // union with 8-connected overlapping runs of the previous row
      for (size_t p = prev_begin; p < prev_end; ++p) {
        const Run& pr = all[p];
        if (pr.x1 < r.x0 - 1) { continue; }
        if (pr.x0 > r.x1 + 1) break;
        if (r.lab == 0) {
          r.lab = uf_find(parent, pr.lab);
        } else {
          int32_t ra = uf_find(parent, r.lab);
          int32_t rb = uf_find(parent, pr.lab);
          if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
        }
      }
      if (r.lab == 0) {
        r.lab = static_cast<int32_t>(parent.size());
        parent.push_back(r.lab);
      }
      all.push_back(r);
    }
    prev_begin = cur_begin;
    prev_end = all.size();
  }

  // Renumber roots in row-major first-run order (== first-pixel order).
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next_label = 0;
  for (auto& r : all) {
    int32_t root = uf_find(parent, r.lab);
    if (!remap[root]) remap[root] = ++next_label;
    r.lab = remap[root];
  }

  std::memset(labels, 0, static_cast<size_t>(h) * w * sizeof(int32_t));
  for (const auto& r : all) {
    std::fill_n(labels + static_cast<int64_t>(r.y) * w + r.x0,
                r.x1 - r.x0 + 1, r.lab);
  }

  if (next_label > cap) return -static_cast<int64_t>(next_label);
  for (int64_t i = 0; i < next_label; ++i) {
    boxes[i * 4 + 0] = w;  boxes[i * 4 + 1] = h;
    boxes[i * 4 + 2] = -1; boxes[i * 4 + 3] = -1;
    seeds[i * 2 + 0] = -1; seeds[i * 2 + 1] = -1;
  }
  for (const auto& r : all) {
    int64_t* b = boxes + static_cast<int64_t>(r.lab - 1) * 4;
    if (r.x0 < b[0]) b[0] = r.x0;
    if (r.y < b[1]) b[1] = r.y;
    if (r.x1 > b[2]) b[2] = r.x1;
    if (r.y > b[3]) b[3] = r.y;
    int64_t* s = seeds + static_cast<int64_t>(r.lab - 1) * 2;
    if (s[0] < 0) { s[0] = r.y; s[1] = r.x0; }
  }
  return next_label;
}

// ---------------------------------------------------------------------------
// Morphology sequence: apply `n_ops` erode/dilate passes back to back with
// one entry call (ops alternate buffers internally). op_codes: 0 = erode,
// 1 = dilate; op_params: (kernel, iterations) pairs. Equivalent to calling
// sbb_morph_binary n_ops times, without the per-call Python/ctypes/
// conversion overhead (a page's post-processing makes ~150 such calls).
// ---------------------------------------------------------------------------

void sbb_morph_seq(const uint8_t* in, int64_t h, int64_t w,
                   const int64_t* op_codes, const int64_t* op_params,
                   int64_t n_ops, uint8_t* out) {
  std::vector<uint8_t> tmp;
  const uint8_t* src = in;
  for (int64_t i = 0; i < n_ops; ++i) {
    uint8_t* dst;
    if (i + 1 == n_ops) {
      dst = out;
    } else {
      if (tmp.empty()) tmp.resize(static_cast<size_t>(h) * w);
      dst = (src == tmp.data()) ? out : tmp.data();
    }
    sbb_morph_binary(src, h, w, op_params[2 * i], op_params[2 * i + 1],
                     op_codes[i] == 1, dst);
    src = dst;
  }
  if (n_ops == 0) std::memcpy(out, in, static_cast<size_t>(h) * w);
  else if (src != out) std::memcpy(out, src, static_cast<size_t>(h) * w);
}

// ---------------------------------------------------------------------------
// Nearest-neighbor resize for uint8 images (parity with
// ops/resize.py::resize_nearest_host — the cv2 INTER_NEAREST index math is
// computed by the Python caller and passed in, so the index semantics live
// in exactly one place). Rows repeated by upscaling are memcpy'd from the
// previous output row.
// ---------------------------------------------------------------------------

void sbb_resize_nearest_u8(const uint8_t* in, int64_t w, int64_t c,
                           const int64_t* ys, const int64_t* xs,
                           int64_t oh, int64_t ow, uint8_t* out) {
  std::vector<int64_t> xoff(static_cast<size_t>(ow));
  for (int64_t j = 0; j < ow; ++j) xoff[j] = xs[j] * c;
  const int64_t orow_bytes = ow * c;
  int64_t prev = -1;
  for (int64_t i = 0; i < oh; ++i) {
    uint8_t* orow = out + i * orow_bytes;
    if (ys[i] == prev) {
      std::memcpy(orow, orow - orow_bytes, static_cast<size_t>(orow_bytes));
      continue;
    }
    prev = ys[i];
    const uint8_t* irow = in + ys[i] * w * c;
    if (c == 3) {
      for (int64_t j = 0; j < ow; ++j) {
        const uint8_t* p = irow + xoff[j];
        orow[3 * j] = p[0];
        orow[3 * j + 1] = p[1];
        orow[3 * j + 2] = p[2];
      }
    } else if (c == 1) {
      for (int64_t j = 0; j < ow; ++j) orow[j] = irow[xoff[j]];
    } else {
      for (int64_t j = 0; j < ow; ++j) {
        std::memcpy(orow + j * c, irow + xoff[j], static_cast<size_t>(c));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Batched point-in-polygon (parity with ops/contours.py::points_in_polygon:
// crossing-number with half-open vertex rule + on-edge tolerance). pts:
// (n, 2) float64 polygon; qx/qy: (m,) query points; out: (m,) uint8 0/1.
// Formulas and epsilons mirror the numpy oracle exactly (the Makefile sets
// -ffp-contract=off so FMA contraction cannot flip borderline comparisons).
// ---------------------------------------------------------------------------

void sbb_points_in_polygon(const double* pts, int64_t n,
                           const double* qx, const double* qy, int64_t m,
                           uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(m));
  if (n < 1) return;
  std::vector<int32_t> crossings(static_cast<size_t>(m), 0);
  std::vector<uint8_t> on_edge(static_cast<size_t>(m), 0);
  for (int64_t i = 0; i < n; ++i) {
    const double x1 = pts[2 * i], y1 = pts[2 * i + 1];
    const int64_t j = (i + 1) % n;
    const double x2 = pts[2 * j], y2 = pts[2 * j + 1];
    const double seg_len2 = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1);
    const double eps = 1e-9 * std::max(seg_len2, 1.0);
    const double xlo = std::min(x1, x2) - 1e-12, xhi = std::max(x1, x2) + 1e-12;
    const double ylo = std::min(y1, y2) - 1e-12, yhi = std::max(y1, y2) + 1e-12;
    const double dy = (y2 - y1) == 0.0 ? 1.0 : (y2 - y1);
    for (int64_t k = 0; k < m; ++k) {
      const double px = qx[k], py = qy[k];
      const double cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1);
      if (std::fabs(cross) <= eps && px >= xlo && px <= xhi && py >= ylo &&
          py <= yhi) {
        on_edge[k] = 1;
      }
      if ((y1 > py) != (y2 > py)) {
        const double xint = x1 + (py - y1) * (x2 - x1) / dy;
        if (px < xint) ++crossings[k];
      }
    }
  }
  for (int64_t k = 0; k < m; ++k) {
    out[k] = static_cast<uint8_t>(((crossings[k] & 1) != 0) || on_edge[k]);
  }
}

// ---------------------------------------------------------------------------
// Symmetric-kernel 1-D correlation on a pre-padded (reflect) signal —
// BIT-exact with ops/profiles.py::gaussian_filter1d_host (itself bit-exact
// with scipy's ni_correlate1d): per element, center tap first, then
// (left + right) * weight pairs added farthest-first. The accumulation
// order is the contract — find_peaks tie-breaking depends on it.
// ypad: n + 2*radius doubles; w: 2*radius + 1 taps; out: n doubles.
// ---------------------------------------------------------------------------
void sbb_correlate1d_sym(const double* ypad, int64_t n, const double* w,
                         int64_t radius, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    double acc = ypad[i + radius] * w[radius];
    for (int64_t j = radius; j >= 1; --j) {
      acc += (ypad[i + radius - j] + ypad[i + radius + j]) * w[radius - j];
    }
    out[i] = acc;
  }
}

// ---------------------------------------------------------------------------
// Row-structured points-in-polygon: the query set is the outer product of a
// SORTED-ascending x grid (xv, nx) and a set of rows (rows, nrows) — exactly
// the shape of the line separator's per-line x-extent queries
// (main.py:780-791: 1000 x samples per candidate line row). Bit-identical to
// sbb_points_in_polygon on the same points, but O(edges * nrows * log nx)
// instead of O(edges * nrows * nx):
//   * crossing counts use a lower_bound on xv (the comparison `px < xint` is
//     the same float compare the scalar loop does) recorded in a per-row
//     difference array;
//   * on-edge tests solve |cross(px)| <= eps for its px interval, widen it
//     conservatively, and re-run the EXACT scalar test only on the few
//     candidate grid points inside.
// out: (nrows * nx) uint8, row-major over rows.
// ---------------------------------------------------------------------------
void sbb_points_in_polygon_rows(const double* pts, int64_t n,
                                const double* xv, int64_t nx,
                                const double* rows, int64_t nrows,
                                uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(nrows * nx));
  if (n < 1 || nx < 1 || nrows < 1) return;
  std::vector<int32_t> diff(static_cast<size_t>(nrows) * (nx + 1), 0);
  std::vector<uint8_t> on_edge(static_cast<size_t>(nrows) * nx, 0);
  for (int64_t i = 0; i < n; ++i) {
    const double x1 = pts[2 * i], y1 = pts[2 * i + 1];
    const int64_t j = (i + 1) % n;
    const double x2 = pts[2 * j], y2 = pts[2 * j + 1];
    const double seg_len2 = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1);
    const double eps = 1e-9 * std::max(seg_len2, 1.0);
    const double xlo = std::min(x1, x2) - 1e-12, xhi = std::max(x1, x2) + 1e-12;
    const double ylo = std::min(y1, y2) - 1e-12, yhi = std::max(y1, y2) + 1e-12;
    const double dy = (y2 - y1) == 0.0 ? 1.0 : (y2 - y1);
    for (int64_t r = 0; r < nrows; ++r) {
      const double py = rows[r];
      // crossing: same predicate and xint arithmetic as the scalar loop;
      // `px < xint` over a sorted grid is a lower_bound
      if ((y1 > py) != (y2 > py)) {
        const double xint = x1 + (py - y1) * (x2 - x1) / dy;
        const double* lb = std::lower_bound(xv, xv + nx, xint);
        const int64_t idx = lb - xv;  // first k with xv[k] >= xint
        if (idx > 0) {
          ++diff[r * (nx + 1)];
          --diff[r * (nx + 1) + idx];
        }
      }
      // on-edge: candidate interval from the linear cross(px), widened, then
      // the exact scalar test on each candidate
      if (py < ylo || py > yhi) continue;
      double cand_lo = xlo, cand_hi = xhi;
      const double dyy = y2 - y1;
      if (std::fabs(dyy) > 0.0) {
        const double xc = x1 + (x2 - x1) * (py - y1) / dyy;
        const double half = eps / std::fabs(dyy) + 1e-6 +
                            1e-9 * (std::fabs(xc) + std::fabs(x1) +
                                    std::fabs(x2));
        cand_lo = std::max(cand_lo, xc - half);
        cand_hi = std::min(cand_hi, xc + half);
      } else {
        // horizontal edge: cross is constant in px
        const double cross0 = (x2 - x1) * (py - y1);
        if (std::fabs(cross0) > eps) continue;
      }
      const int64_t k0 = std::lower_bound(xv, xv + nx, cand_lo) - xv;
      for (int64_t k = k0; k < nx && xv[k] <= cand_hi; ++k) {
        const double px = xv[k];
        const double cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1);
        if (std::fabs(cross) <= eps && px >= xlo && px <= xhi && py >= ylo &&
            py <= yhi) {
          on_edge[r * nx + k] = 1;
        }
      }
    }
  }
  for (int64_t r = 0; r < nrows; ++r) {
    int32_t acc = 0;
    for (int64_t k = 0; k < nx; ++k) {
      acc += diff[r * (nx + 1) + k];
      out[r * nx + k] =
          static_cast<uint8_t>(((acc & 1) != 0) || on_edge[r * nx + k]);
    }
  }
}

}  // extern "C"
