// fabric_host: native host-side ingestion kernels for fabric-tpu.
//
// The reference delegates its host-side hot loops to native code in
// dependencies — OpenCV resize/percentile-stretch and GDAL decode
// (SURVEY.md §2.3).  This library is the first-party replacement for the
// compute parts: cv2-exact bilinear resize, percentile stretch, and fused
// normalize+resize (the per-band inner loop of city loading,
// reference utils/dataloaders.py:86-112).  Exposed via a plain C ABI and
// loaded with ctypes (fabric_tpu/native/__init__.py); every entry point has
// a numpy fallback so the Python package works without the .so.
//
// Build: make -C csrc   (produces csrc/libfabric_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// cv2.INTER_LINEAR coordinate mapping: src = (dst + 0.5) * scale - 0.5,
// taps clamped to the image (see fabric_tpu/utils/image.py:_linear_coeffs).
static void linear_coeffs(int dst_size, int src_size,
                          std::vector<int>& lo, std::vector<float>& frac) {
  lo.resize(dst_size);
  frac.resize(dst_size);
  const double scale = static_cast<double>(src_size) / dst_size;
  for (int i = 0; i < dst_size; ++i) {
    double fx = (i + 0.5) * scale - 0.5;
    int sx = static_cast<int>(std::floor(fx));
    double f = fx - sx;
    if (sx < 0) { sx = 0; f = 0.0; }
    if (src_size > 1 && sx >= src_size - 1) { sx = src_size - 2; f = 1.0; }
    if (src_size == 1) { sx = 0; f = 0.0; }
    lo[i] = sx;
    frac[i] = static_cast<float>(f);
  }
}

// Bilinear resize of a single-channel float32 (h, w) image to (oh, ow),
// matching cv2.resize(img, (ow, oh), INTER_LINEAR) on float input.
void resize_bilinear_f32(const float* src, int h, int w,
                         float* dst, int oh, int ow) {
  std::vector<int> ylo, xlo;
  std::vector<float> yf, xf;
  linear_coeffs(oh, h, ylo, yf);
  linear_coeffs(ow, w, xlo, xf);
  std::vector<float> row(ow * 2);
  for (int y = 0; y < oh; ++y) {
    const int y0 = ylo[y];
    const int y1 = std::min(y0 + 1, h - 1);
    const float fy = yf[y];
    const float* r0 = src + static_cast<int64_t>(y0) * w;
    const float* r1 = src + static_cast<int64_t>(y1) * w;
    float* out = dst + static_cast<int64_t>(y) * ow;
    for (int x = 0; x < ow; ++x) {
      const int x0 = xlo[x];
      const int x1 = std::min(x0 + 1, w - 1);
      const float fx = xf[x];
      const float top = r0[x0] * (1.f - fx) + r0[x1] * fx;
      const float bot = r1[x0] * (1.f - fx) + r1[x1] * fx;
      out[x] = top * (1.f - fy) + bot * fy;
    }
  }
}

// Fused (x - mean) / std normalize + bilinear resize: the per-band hot
// loop of city loading, one pass instead of two full-image sweeps.
void normalize_resize_f32(const float* src, int h, int w,
                          float mean, float std_, float* dst,
                          int oh, int ow) {
  const float inv = 1.0f / std_;
  if (oh == h && ow == w) {
    const int64_t n = static_cast<int64_t>(h) * w;
    for (int64_t i = 0; i < n; ++i) dst[i] = (src[i] - mean) * inv;
    return;
  }
  resize_bilinear_f32(src, h, w, dst, oh, ow);
  const int64_t n = static_cast<int64_t>(oh) * ow;
  for (int64_t i = 0; i < n; ++i) dst[i] = (dst[i] - mean) * inv;
}

// 2-98 percentile stretch to uint8 over strictly-positive pixels
// (reference utils/dataloaders.py:38-48).  Percentile uses numpy's
// 'linear' interpolation on the sorted positive values.
void stretch_8bit_f32(const float* src, int64_t n,
                      double lower_pct, double higher_pct, uint8_t* dst) {
  std::vector<float> pos;
  pos.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (src[i] > 0.f) pos.push_back(src[i]);
  if (pos.empty()) {
    std::memset(dst, 0, n);
    return;
  }
  std::sort(pos.begin(), pos.end());
  auto percentile = [&](double q) -> double {
    const double idx = q / 100.0 * (pos.size() - 1);
    const int64_t i0 = static_cast<int64_t>(std::floor(idx));
    const int64_t i1 = std::min<int64_t>(i0 + 1, pos.size() - 1);
    const double f = idx - i0;
    return pos[i0] * (1.0 - f) + pos[i1] * f;
  };
  const double c = percentile(lower_pct);
  const double d = percentile(higher_pct);
  const double denom = (d != c) ? (d - c) : 1.0;
  const double k = 255.0 / denom;
  for (int64_t i = 0; i < n; ++i) {
    double t = (src[i] - c) * k;
    if (t < 0.0) t = 0.0;
    if (t > 255.0) t = 255.0;
    dst[i] = static_cast<uint8_t>(t);
  }
}

}  // extern "C"
