// Native host-side image preprocessing for the yolopoint_tpu data loader.
//
// The reference delegates its hot host-side pixel work to OpenCV C++
// (cv2.resize INTER_LINEAR/INTER_AREA, copyMakeBorder letterbox padding —
// /root/reference/src/utils/augmentations_yolo.py:26-56,
// /root/reference/src/datasets/DataClasses.py:505-526). This library provides
// the same primitives as a dependency-free C++ core so the loader does not
// need OpenCV on the serving host: bilinear + area resampling, letterbox
// composition, uint8 -> float32 NHWC normalization. Exposed as a C ABI for
// ctypes (pybind11 is not available in this image).
//
// Build: make -C native   (produces libyp_preprocess.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Bilinear resize, uint8 HWC -> uint8 HWC (cv2.INTER_LINEAR semantics:
// half-pixel centers, clamped edges).
void yp_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                           uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      const uint8_t* p00 = src + (y0 * sw + x0) * c;
      const uint8_t* p01 = src + (y0 * sw + x1) * c;
      const uint8_t* p10 = src + (y1 * sw + x0) * c;
      const uint8_t* p11 = src + (y1 * sw + x1) * c;
      uint8_t* out = dst + (y * dw + x) * c;
      for (int k = 0; k < c; ++k) {
        float top = p00[k] * (1 - wx) + p01[k] * wx;
        float bot = p10[k] * (1 - wx) + p11[k] * wx;
        float v = top * (1 - wy) + bot * wy;
        out[k] = static_cast<uint8_t>(std::lround(std::clamp(v, 0.f, 255.f)));
      }
    }
  }
}

// Area (box-filter) resize for downscaling, cv2.INTER_AREA-style.
void yp_resize_area_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    double fy0 = y * sy, fy1 = (y + 1) * sy;
    int iy0 = static_cast<int>(fy0), iy1 = std::min(static_cast<int>(std::ceil(fy1)), sh);
    for (int x = 0; x < dw; ++x) {
      double fx0 = x * sx, fx1 = (x + 1) * sx;
      int ix0 = static_cast<int>(fx0), ix1 = std::min(static_cast<int>(std::ceil(fx1)), sw);
      for (int k = 0; k < c; ++k) {
        double acc = 0.0, area = 0.0;
        for (int yy = iy0; yy < iy1; ++yy) {
          double hy = std::min<double>(yy + 1, fy1) - std::max<double>(yy, fy0);
          for (int xx = ix0; xx < ix1; ++xx) {
            double wx2 = std::min<double>(xx + 1, fx1) - std::max<double>(xx, fx0);
            acc += src[(yy * sw + xx) * c + k] * hy * wx2;
            area += hy * wx2;
          }
        }
        dst[(y * dw + x) * c + k] =
            static_cast<uint8_t>(std::lround(acc / std::max(area, 1e-9)));
      }
    }
  }
}

// Letterbox: aspect-preserving resize into (dh, dw) with `pad_value` borders.
// Writes the resized image centered; returns pad offsets through out params.
void yp_letterbox_u8(const uint8_t* src, int sh, int sw, int c,
                     uint8_t* dst, int dh, int dw, uint8_t pad_value,
                     int* top, int* left, float* ratio) {
  float r = std::min(static_cast<float>(dh) / sh, static_cast<float>(dw) / sw);
  int nh = static_cast<int>(std::lround(sh * r));
  int nw = static_cast<int>(std::lround(sw * r));
  std::vector<uint8_t> tmp(static_cast<size_t>(nh) * nw * c);
  if (r < 1.0f) {
    yp_resize_area_u8(src, sh, sw, c, tmp.data(), nh, nw);
  } else {
    yp_resize_bilinear_u8(src, sh, sw, c, tmp.data(), nh, nw);
  }
  std::memset(dst, pad_value, static_cast<size_t>(dh) * dw * c);
  int t = (dh - nh) / 2;
  int l = (dw - nw) / 2;
  for (int y = 0; y < nh; ++y) {
    std::memcpy(dst + ((t + y) * dw + l) * c, tmp.data() + y * nw * c,
                static_cast<size_t>(nw) * c);
  }
  *top = t;
  *left = l;
  *ratio = r;
}

// uint8 HWC -> float32 HWC in [0, 1] (the upload format of the pipeline).
void yp_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

// Inverse perspective warp with a NORMALIZED-coords homography — exact
// host twin of the device `ops.geometry.warp_image` (align_corners grid,
// zero padding; mode 0 = bilinear, 1 = nearest). TPUs lower per-pixel
// gathers poorly (~0.9 s per 640px batch-32 warp), so the training data
// path warps on host CPU workers, overlapped with device compute — the
// reference's architecture (cv2.warpPerspective on loader workers,
// /root/reference/src/utils/utils.py:333-398).
void yp_warp_perspective_f32(const float* src, int h, int w, int c,
                             const float* hinv,  // 3x3 row-major
                             float* dst, int mode) {
  const float nx = w > 1 ? 2.0f / (w - 1) : 0.0f;
  const float ny = h > 1 ? 2.0f / (h - 1) : 0.0f;
  const float hx = 0.5f * (w - 1);
  const float hy = 0.5f * (h - 1);
  // two-pass per row: (1) a branch/gather-free coordinate pass the compiler
  // auto-vectorizes (the divide dominates scalar cost), (2) the tap gather
  // with an interior fast path and c=1/c=3 specializations — together ~3x
  // over the fused scalar loop on the single-core loader host. Arithmetic is
  // kept EXPRESSION-IDENTICAL to the device twin (no incremental drift).
  std::vector<float> sxbuf(w), sybuf(w);
  for (int y = 0; y < h; ++y) {
    const float yn = -1.0f + y * ny;
    const float bx = hinv[1] * yn + hinv[2];
    const float by = hinv[4] * yn + hinv[5];
    const float bd = hinv[7] * yn + hinv[8];
    float* sxp = sxbuf.data();
    float* syp = sybuf.data();
    for (int x = 0; x < w; ++x) {
      const float xn = -1.0f + x * nx;
      const float inv = 1.0f / (hinv[6] * xn + bd);
      sxp[x] = ((hinv[0] * xn + bx) * inv + 1.0f) * hx;
      syp[x] = ((hinv[3] * xn + by) * inv + 1.0f) * hy;
    }
    float* out_row = dst + static_cast<size_t>(y) * w * c;
    if (mode == 1) {  // nearest (floor(x + 0.5), like the device twin)
      for (int x = 0; x < w; ++x) {
        const int xi = static_cast<int>(std::floor(sxp[x] + 0.5f));
        const int yi = static_cast<int>(std::floor(syp[x] + 0.5f));
        float* out = out_row + static_cast<size_t>(x) * c;
        if (xi < 0 || xi > w - 1 || yi < 0 || yi > h - 1) {
          for (int k = 0; k < c; ++k) out[k] = 0.0f;
        } else {
          const float* p = src + (static_cast<size_t>(yi) * w + xi) * c;
          for (int k = 0; k < c; ++k) out[k] = p[k];
        }
      }
      continue;
    }
    for (int x = 0; x < w; ++x) {
      const float sx = sxp[x];
      const float sy = syp[x];
      const float fx = std::floor(sx);
      const float fy = std::floor(sy);
      const float wx = sx - fx;
      const float wy = sy - fy;
      const int x0 = static_cast<int>(fx);
      const int y0 = static_cast<int>(fy);
      float* out = out_row + static_cast<size_t>(x) * c;
      if (x0 >= 0 && x0 < w - 1 && y0 >= 0 && y0 < h - 1) {
        // interior: all four taps in bounds, no per-tap branches
        const float w00 = (1.0f - wy) * (1.0f - wx);
        const float w01 = (1.0f - wy) * wx;
        const float w10 = wy * (1.0f - wx);
        const float w11 = wy * wx;
        const float* p0 = src + (static_cast<size_t>(y0) * w + x0) * c;
        const float* p1 = p0 + static_cast<size_t>(w) * c;
        if (c == 3) {
          out[0] = w00 * p0[0] + w01 * p0[3] + w10 * p1[0] + w11 * p1[3];
          out[1] = w00 * p0[1] + w01 * p0[4] + w10 * p1[1] + w11 * p1[4];
          out[2] = w00 * p0[2] + w01 * p0[5] + w10 * p1[2] + w11 * p1[5];
        } else if (c == 1) {
          out[0] = w00 * p0[0] + w01 * p0[1] + w10 * p1[0] + w11 * p1[1];
        } else {
          for (int k = 0; k < c; ++k) {
            out[k] = w00 * p0[k] + w01 * p0[c + k] + w10 * p1[k] + w11 * p1[c + k];
          }
        }
        continue;
      }
      // border: per-tap bound checks, channel chunks of 16 so EVERY output
      // channel is written regardless of c
      for (int k0 = 0; k0 < c; k0 += 16) {
        float acc[16] = {0};
        const int cc = (c - k0) < 16 ? (c - k0) : 16;
        for (int dy = 0; dy < 2; ++dy) {
          const int yi = y0 + dy;
          if (yi < 0 || yi > h - 1) continue;
          const float wyv = dy ? wy : 1.0f - wy;
          for (int dx = 0; dx < 2; ++dx) {
            const int xi = x0 + dx;
            if (xi < 0 || xi > w - 1) continue;
            const float wv = wyv * (dx ? wx : 1.0f - wx);
            const float* p = src + (static_cast<size_t>(yi) * w + xi) * c + k0;
            for (int k = 0; k < cc; ++k) acc[k] += wv * p[k];
          }
        }
        for (int k = 0; k < cc; ++k) out[k0 + k] = acc[k];
      }
    }
  }
}

// Warp-coverage mask: exactly the nearest-neighbour inverse warp of an
// all-ones image (out = 1 iff the rounded source tap is in bounds) but with
// no source reads at all — a pure, auto-vectorizable bounds test. Used for
// the validity masks of the host-warp training path, where it replaces a
// full warp call per view.
void yp_warp_coverage_f32(int h, int w, const float* hinv, float* dst) {
  const float nx = w > 1 ? 2.0f / (w - 1) : 0.0f;
  const float ny = h > 1 ? 2.0f / (h - 1) : 0.0f;
  const float hxs = 0.5f * (w - 1);
  const float hys = 0.5f * (h - 1);
  for (int y = 0; y < h; ++y) {
    const float yn = -1.0f + y * ny;
    const float bx = hinv[1] * yn + hinv[2];
    const float by = hinv[4] * yn + hinv[5];
    const float bd = hinv[7] * yn + hinv[8];
    float* out = dst + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      const float xn = -1.0f + x * nx;
      const float inv = 1.0f / (hinv[6] * xn + bd);
      const float sx = ((hinv[0] * xn + bx) * inv + 1.0f) * hxs;
      const float sy = ((hinv[3] * xn + by) * inv + 1.0f) * hys;
      const float xi = std::floor(sx + 0.5f);
      const float yi = std::floor(sy + 0.5f);
      out[x] = (xi >= 0.0f && xi <= w - 1 && yi >= 0.0f && yi <= h - 1)
                   ? 1.0f : 0.0f;
    }
  }
}

}  // extern "C"
