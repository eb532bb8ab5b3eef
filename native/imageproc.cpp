// Native host-side image pipeline for the eval data path.
//
// The reference's host image work is PIL/cv2 Python (preprocess at
// /root/reference/modules/models/__init__.py:12-101, PIE mask decode at
// dataset/pie_bench_data.py:92-108).  For TPU eval sweeps the host is a
// single-core bottleneck feeding the chip, so the hot host ops live here:
// center-crop + resize (area / bilinear) + [-1,1] normalization fused in one
// pass, uint8 postprocessing, and run-length mask decoding.  Exposed through
// a C ABI consumed via ctypes (eta_inversion_tpu/native.py).
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Fused center-crop + area resize + normalize:
// src: H x W x 3 uint8 -> dst: S x S x 3 float32 in [-1, 1].
// Area filter (cv2.INTER_AREA-like) for downscale; bilinear for upscale.
void preprocess_image(const uint8_t* src, int h, int w, float* dst, int s,
                      int center_crop) {
  int side = std::min(h, w);
  int y0 = 0, x0 = 0;
  if (center_crop) {
    y0 = (h - side) / 2;
    x0 = (w - side) / 2;
  } else {
    side = h;  // caller guarantees square when not cropping
  }

  const double scale = static_cast<double>(side) / s;
  const float inv255 = 1.0f / 127.5f;

  if (scale >= 1.0) {
    // area (box) filter over the source footprint of each dst pixel
    for (int oy = 0; oy < s; ++oy) {
      double sy0 = oy * scale, sy1 = (oy + 1) * scale;
      int iy0 = static_cast<int>(sy0), iy1 = std::min<int>(side, (int)std::ceil(sy1));
      for (int ox = 0; ox < s; ++ox) {
        double sx0 = ox * scale, sx1 = (ox + 1) * scale;
        int ix0 = static_cast<int>(sx0), ix1 = std::min<int>(side, (int)std::ceil(sx1));
        double acc[3] = {0, 0, 0};
        double wsum = 0;
        for (int iy = iy0; iy < iy1; ++iy) {
          double wy = std::min<double>(sy1, iy + 1) - std::max<double>(sy0, iy);
          const uint8_t* row = src + ((y0 + iy) * w + x0) * 3;
          for (int ix = ix0; ix < ix1; ++ix) {
            double wx = std::min<double>(sx1, ix + 1) - std::max<double>(sx0, ix);
            double wgt = wx * wy;
            const uint8_t* p = row + ix * 3;
            acc[0] += wgt * p[0];
            acc[1] += wgt * p[1];
            acc[2] += wgt * p[2];
            wsum += wgt;
          }
        }
        float* o = dst + (oy * s + ox) * 3;
        for (int c = 0; c < 3; ++c)
          o[c] = static_cast<float>(acc[c] / wsum) * inv255 - 1.0f;
      }
    }
  } else {
    // bilinear upscale (align_corners=false convention)
    for (int oy = 0; oy < s; ++oy) {
      double fy = (oy + 0.5) * scale - 0.5;
      int iy = static_cast<int>(std::floor(fy));
      double dy = fy - iy;
      int iy_0 = std::clamp(iy, 0, side - 1), iy_1 = std::clamp(iy + 1, 0, side - 1);
      for (int ox = 0; ox < s; ++ox) {
        double fx = (ox + 0.5) * scale - 0.5;
        int ix = static_cast<int>(std::floor(fx));
        double dx = fx - ix;
        int ix_0 = std::clamp(ix, 0, side - 1), ix_1 = std::clamp(ix + 1, 0, side - 1);
        const uint8_t* p00 = src + ((y0 + iy_0) * w + x0 + ix_0) * 3;
        const uint8_t* p01 = src + ((y0 + iy_0) * w + x0 + ix_1) * 3;
        const uint8_t* p10 = src + ((y0 + iy_1) * w + x0 + ix_0) * 3;
        const uint8_t* p11 = src + ((y0 + iy_1) * w + x0 + ix_1) * 3;
        float* o = dst + (oy * s + ox) * 3;
        for (int c = 0; c < 3; ++c) {
          double v = (1 - dy) * ((1 - dx) * p00[c] + dx * p01[c]) +
                     dy * ((1 - dx) * p10[c] + dx * p11[c]);
          o[c] = static_cast<float>(v) * inv255 - 1.0f;
        }
      }
    }
  }
}

// [-1,1] float32 HWC -> uint8 HWC (postprocess, reference
// modules/models/__init__.py:79-101)
void postprocess_image(const float* src, int n, uint8_t* dst) {
  for (int i = 0; i < n; ++i) {
    float v = (src[i] * 0.5f + 0.5f) * 255.0f;
    dst[i] = static_cast<uint8_t>(std::clamp(std::lround(v), 0L, 255L));
  }
}

// PIE run-length mask decode + 1px border fill
// (reference dataset/pie_bench_data.py:92-108)
void decode_rle_mask(const int64_t* enc, int n_pairs, float* mask, int h, int w) {
  const int64_t length = static_cast<int64_t>(h) * w;
  std::memset(mask, 0, sizeof(float) * length);
  for (int i = 0; i < n_pairs; ++i) {
    int64_t start = enc[2 * i];
    int64_t run = std::min<int64_t>(enc[2 * i + 1], length - start);
    for (int64_t j = 0; j < run; ++j) mask[start + j] = 1.0f;
  }
  for (int x = 0; x < w; ++x) {
    mask[x] = 1.0f;
    mask[(h - 1) * (int64_t)w + x] = 1.0f;
  }
  for (int y = 0; y < h; ++y) {
    mask[y * (int64_t)w] = 1.0f;
    mask[y * (int64_t)w + w - 1] = 1.0f;
  }
}

}  // extern "C"
