// Fast PPM P3 writer — native equivalent of the reference's output path
// (src/render_io.rs:3-31 + src/books/*/color.rs:14-32): finalize the
// (RGB-sum, spp) accumulation into 8-bit and format P3 text.
//
// The Python fallback (numpy savetxt) takes ~1 s per megapixel; this is
// ~30 ms.  Exposed via ctypes from rustraytrace_tpu/native.py.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// accum: h*w*3 f32 radiance sums; spp: samples accumulated.
// out: caller-allocated buffer (>= 64 + h*w*12 bytes). Returns bytes written.
long long rtt_finalize_ppm_p3(const float* accum, int h, int w,
                              long long spp, char* out) {
  char* p = out;
  p += std::sprintf(p, "P3\n%d %d\n255\n", w, h);
  const double scale = spp > 0 ? 1.0 / (double)spp : 0.0;
  const long long n = (long long)h * w;
  for (long long i = 0; i < n; ++i) {
    int c[3];
    for (int k = 0; k < 3; ++k) {
      double v = accum[i * 3 + k] * scale;
      if (!std::isfinite(v)) v = 0.0;         // render_io.rs:16-18
      v = std::sqrt(v < 0.0 ? 0.0 : v);       // gamma 2
      if (v > 0.999) v = 0.999;               // clamp (render_io.rs:24)
      if (v < 0.0) v = 0.0;
      c[k] = (int)(256.0 * v);
    }
    p += std::sprintf(p, "%d %d %d\n", c[0], c[1], c[2]);
  }
  return (long long)(p - out);
}

// u8 image -> P3 text (for already-finalized images). Returns bytes written.
long long rtt_u8_ppm_p3(const unsigned char* img, int h, int w, char* out) {
  char* p = out;
  p += std::sprintf(p, "P3\n%d %d\n255\n", w, h);
  const long long n = (long long)h * w;
  for (long long i = 0; i < n; ++i) {
    p += std::sprintf(p, "%d %d %d\n", img[i * 3], img[i * 3 + 1],
                      img[i * 3 + 2]);
  }
  return (long long)(p - out);
}

}  // extern "C"
