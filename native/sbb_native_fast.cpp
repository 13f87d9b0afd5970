// Single-precision hot kernels compiled with -ffp-contract=fast: the main
// translation unit pins -ffp-contract=off so its float64 comparisons match
// the numpy oracles bit for bit; these f32 kernels only feed thresholded
// binary masks, where FMA contraction is harmless (tests/test_native.py
// asserts the thresholded outputs match the f64 kernel).

#include <cmath>
#include <cstdint>

extern "C" {

// Single-precision variant of sbb_rotate for binary masks: the pipeline
// thresholds rotated masks at |v| > 1e-3 (stages.textline_postprocess), and
// f32 keeps ~1e-6 relative accuracy on 0/255 inputs, so the thresholded
// mask is identical while the kernel runs ~2x faster on the 1-core host.
static inline void cubic_wf(float f, float* w) {
  const float A = -0.75f;
  float x;
  x = 1.0f + f; w[0] = ((A * x - 5.0f * A) * x + 8.0f * A) * x - 4.0f * A;
  x = f;        w[1] = ((A + 2.0f) * x - (A + 3.0f)) * x * x + 1.0f;
  x = 1.0f - f; w[2] = ((A + 2.0f) * x - (A + 3.0f)) * x * x + 1.0f;
  x = 2.0f - f; w[3] = ((A * x - 5.0f * A) * x + 8.0f * A) * x - 4.0f * A;
}

void sbb_rotate_f32(const float* in, int64_t h, int64_t w,
                    double angle_deg, float* out) {
  const float cx = static_cast<float>(w / 2);
  const float cy = static_cast<float>(h / 2);
  const double rad = angle_deg * 3.14159265358979323846 / 180.0;
  const float a = static_cast<float>(std::cos(rad));
  const float b = static_cast<float>(std::sin(rad));
  auto clampi = [](int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  for (int64_t y = 0; y < h; ++y) {
    const float dy = static_cast<float>(y) - cy;
    float* orow = out + y * w;
    for (int64_t x = 0; x < w; ++x) {
      const float dx = static_cast<float>(x) - cx;
      const float sx = a * dx - b * dy + cx;
      const float sy = b * dx + a * dy + cy;
      float fy0 = std::floor(sy), fx0 = std::floor(sx);
      float fy = sy - fy0, fx = sx - fx0;
      int64_t iy = static_cast<int64_t>(fy0), ix = static_cast<int64_t>(fx0);
      float wy[4], wx[4];
      cubic_wf(fy, wy);
      cubic_wf(fx, wx);
      float acc = 0.0f;
      if (iy >= 1 && iy + 2 < h && ix >= 1 && ix + 2 < w) {
        const float* p = in + (iy - 1) * w + (ix - 1);
        for (int t = 0; t < 4; ++t, p += w) {
          acc += wy[t] * (wx[0] * p[0] + wx[1] * p[1] + wx[2] * p[2] +
                          wx[3] * p[3]);
        }
      } else {
        for (int t = 0; t < 4; ++t) {
          const float* rowp = in + clampi(iy - 1 + t, 0, h - 1) * w;
          float rowv = 0.0f;
          for (int u = 0; u < 4; ++u) {
            rowv += wx[u] * rowp[clampi(ix - 1 + u, 0, w - 1)];
          }
          acc += wy[t] * rowv;
        }
      }
      orow[x] = acc;
    }
  }
}


}  // extern "C"
