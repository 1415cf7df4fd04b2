// fastvideo: host-side video preprocessing kernels.
//
// TPU-native replacement for the hot numpy/cv2 loop in the reference's
// DataLoader workers (reference: utils/video.py:247-288 — frame sampling,
// resize, normalize). The TPU is fed from a single host process, so the
// decode->resize->normalize path must be tight C++: one fused pass, no
// intermediate allocations, threads across frames.
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float w) { return a + (b - a) * w; }

// Precomputed separable-resize tables (cv2/half-pixel-centers convention:
// src = (dst + 0.5) * scale - 0.5, clamped).
struct ResizePlan {
  std::vector<int> y0, y1, x0, x1;
  std::vector<float> wy, wx;
  int H, W, oh, ow;
};

ResizePlan make_plan(int H, int W, int oh, int ow) {
  ResizePlan p;
  p.H = H; p.W = W; p.oh = oh; p.ow = ow;
  p.y0.resize(oh); p.y1.resize(oh); p.wy.resize(oh);
  p.x0.resize(ow); p.x1.resize(ow); p.wx.resize(ow);
  const float sy = float(H) / float(oh);
  const float sx = float(W) / float(ow);
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = (int)fy;
    if (y0 > H - 1) y0 = H - 1;
    p.y0[y] = y0;
    p.y1[y] = std::min(y0 + 1, H - 1);
    p.wy[y] = fy - y0;
  }
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    int x0 = (int)fx;
    if (x0 > W - 1) x0 = W - 1;
    p.x0[x] = x0;
    p.x1[x] = std::min(x0 + 1, W - 1);
    p.wx[x] = fx - x0;
  }
  return p;
}

// Output stores: float passthrough or round-half-up uint8 (bilinear of
// [0,255] inputs stays in range, so no clamp is needed).
inline void store_px(float v, float* dst) { *dst = v; }
inline void store_px(float v, uint8_t* dst) { *dst = (uint8_t)(v + 0.5f); }

// One resized output row: vertical blend of two source rows into a float
// row buffer, then horizontal lerp into `orow` (float or uint8).
template <typename OutT>
inline void resize_one_row(const uint8_t* row0, const uint8_t* row1, float wy,
                           const ResizePlan& p, int C, OutT* orow,
                           std::vector<float>& rowbuf) {
  const int W = p.W, ow = p.ow;
  rowbuf.resize((size_t)W * C);
  float* rb = rowbuf.data();
  const int n = W * C;
  for (int i = 0; i < n; ++i) rb[i] = lerp(row0[i], row1[i], wy);
  for (int x = 0; x < ow; ++x) {
    const float* a = rb + (size_t)p.x0[x] * C;
    const float* b = rb + (size_t)p.x1[x] * C;
    const float wx = p.wx[x];
    for (int c = 0; c < C; ++c) store_px(lerp(a[c], b[c], wx), orow + x * C + c);
  }
}

// Separable bilinear: vertical blend into a row buffer, then horizontal.
template <typename OutT>
void resize_frame_t(const uint8_t* in, const ResizePlan& p, int C, OutT* out,
                    std::vector<float>& rowbuf) {
  const int W = p.W, ow = p.ow;
  for (int y = 0; y < p.oh; ++y) {
    resize_one_row(in + (size_t)p.y0[y] * W * C, in + (size_t)p.y1[y] * W * C,
                   p.wy[y], p, C, out + (size_t)y * ow * C, rowbuf);
  }
}

void resize_frame(const uint8_t* in, const ResizePlan& p, int C, float* out,
                  std::vector<float>& rowbuf) {
  resize_frame_t(in, p, C, out, rowbuf);
}

void run_threaded(int n, const std::function<void(int)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = std::max(1u, std::min<unsigned>(hw, (unsigned)n));
  if (nthreads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  std::atomic<int> next{0};
  for (int t = 0; t < nthreads; ++t) {
    ts.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// in: [F, H, W, C] uint8; out: [F, oh, ow, C] float32
void fv_resize_bilinear(const uint8_t* in, int F, int H, int W, int C,
                        float* out, int oh, int ow) {
  const ResizePlan plan = make_plan(H, W, oh, ow);
  run_threaded(F, [&](int f) {
    thread_local std::vector<float> rowbuf;
    resize_frame(in + (size_t)f * H * W * C, plan, C,
                 out + (size_t)f * oh * ow * C, rowbuf);
  });
}

// Fused: gather frames by index, resize, normalize ((x-mean)/std per channel).
// in: [F, H, W, C] uint8; idx: [n_out]; out: [n_out, oh, ow, C] float32.
void fv_sample_resize_normalize(const uint8_t* in, int F, int H, int W, int C,
                                const int64_t* idx, int n_out, float* out,
                                int oh, int ow, const float* mean,
                                const float* std_, int do_norm) {
  std::vector<float> inv(C, 1.f);
  for (int c = 0; c < C; ++c)
    inv[c] = 1.f / (std_[c] > 1e-6f ? std_[c] : 1e-6f);
  const ResizePlan plan = make_plan(H, W, oh, ow);
  run_threaded(n_out, [&](int i) {
    thread_local std::vector<float> rowbuf;
    int64_t f = idx[i];
    if (f < 0) f = 0;
    if (f >= F) f = F - 1;
    float* dst = out + (size_t)i * oh * ow * C;
    resize_frame(in + (size_t)f * H * W * C, plan, C, dst, rowbuf);
    if (do_norm) {
      const size_t n = (size_t)oh * ow;
      for (size_t p = 0; p < n; ++p)
        for (int c = 0; c < C; ++c)
          dst[p * C + c] = (dst[p * C + c] - mean[c]) * inv[c];
    }
  });
}

// uint8-output variants for the uint8 H2D wire: normalization is folded
// into the device patchify weights (models/layers._PatchProj), so the host
// must NOT produce normalized float pixels — writing uint8 directly cuts
// the resize output traffic 4x and removes the separate f32->u8 cast pass
// the loader otherwise does (data/video_io.py load_video output_dtype
// handling; reference normalizes on the host instead, utils/video.py:278).
// in: [F, H, W, C] uint8; out: [F, oh, ow, C] uint8
void fv_resize_bilinear_u8(const uint8_t* in, int F, int H, int W, int C,
                           uint8_t* out, int oh, int ow) {
  const ResizePlan plan = make_plan(H, W, oh, ow);
  run_threaded(F, [&](int f) {
    thread_local std::vector<float> rowbuf;
    resize_frame_t(in + (size_t)f * H * W * C, plan, C,
                   out + (size_t)f * oh * ow * C, rowbuf);
  });
}

// Fused gather+resize to uint8 (replaces the numpy idx-gather copy AND the
// f32 resize + round/cast passes on the uint8 wire).
// in: [F, H, W, C] uint8; idx: [n_out]; out: [n_out, oh, ow, C] uint8.
void fv_sample_resize_u8(const uint8_t* in, int F, int H, int W, int C,
                         const int64_t* idx, int n_out, uint8_t* out,
                         int oh, int ow) {
  const ResizePlan plan = make_plan(H, W, oh, ow);
  run_threaded(n_out, [&](int i) {
    thread_local std::vector<float> rowbuf;
    int64_t f = idx[i];
    if (f < 0) f = 0;
    if (f >= F) f = F - 1;
    resize_frame_t(in + (size_t)f * H * W * C, plan, C,
                   out + (size_t)i * oh * ow * C, rowbuf);
  });
}

// Fully fused serving-wire kernel: gather frames by index, resize, and
// write straight into the patch-major layout (data/patch_wire.py) — the
// resized frame is never materialized. Each resized output row lands as
// Wn runs of pw*C contiguous bytes at token-row strides, exactly like
// fv_space_to_depth's inner loop.
// in: [F, H, W, C] uint8; idx: [n_out] (n_out = T, divisible by pt);
// out: [(n_out/pt)*(oh/ph)*(ow/pw), pt*ph*pw*C] uint8.
void fv_sample_resize_patch(const uint8_t* in, int F, int H, int W, int C,
                            const int64_t* idx, int n_out, int oh, int ow,
                            int pt, int ph, int pw, uint8_t* out) {
  const ResizePlan plan = make_plan(H, W, oh, ow);
  const int Hn = oh / ph, Wn = ow / pw;
  const size_t run = (size_t)pw * C;       // contiguous bytes per copy
  const size_t K = (size_t)pt * ph * run;  // bytes per output token row
  run_threaded(n_out, [&](int t) {
    thread_local std::vector<float> rowbuf;
    thread_local std::vector<uint8_t> u8row;
    u8row.resize((size_t)ow * C);
    int64_t f = idx[t];
    if (f < 0) f = 0;
    if (f >= F) f = F - 1;
    const uint8_t* frame = in + (size_t)f * H * W * C;
    const size_t tok0 = (size_t)(t / pt) * Hn * Wn;  // first token of tn
    const size_t dt = (size_t)(t % pt);
    for (int y = 0; y < oh; ++y) {
      resize_one_row(frame + (size_t)plan.y0[y] * W * C,
                     frame + (size_t)plan.y1[y] * W * C, plan.wy[y], plan, C,
                     u8row.data(), rowbuf);
      uint8_t* dst = out + (tok0 + (size_t)(y / ph) * Wn) * K +
                     (dt * ph + (size_t)(y % ph)) * run;
      for (int wn = 0; wn < Wn; ++wn)
        std::memcpy(dst + (size_t)wn * K, u8row.data() + (size_t)wn * run,
                    run);
    }
  });
}

// Per-channel sum / sum-of-squares over a uint8 clip (dataset statistics;
// reference: utils/video_project.py:10-101 / stats_dataset).
void fv_channel_stats(const uint8_t* in, int64_t n_pixels, int C, double* sum,
                      double* sumsq) {
  for (int c = 0; c < C; ++c) {
    sum[c] = 0.0;
    sumsq[c] = 0.0;
  }
  for (int64_t p = 0; p < n_pixels; ++p) {
    for (int c = 0; c < C; ++c) {
      const double v = in[p * C + c];
      sum[c] += v;
      sumsq[c] += v * v;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// RandAugment ops (reference: utils/video.py:268-275 applies torchvision
// RandAugment(magnitude=9, num_ops=2) to the whole clip). Semantics mirror
// deepcoro_clip_tpu/data/randaugment.py (the numpy oracle) op for op:
// geometry = one inverse-mapped bilinear affine warp, photometric ops are
// 256-entry LUTs where possible. Python keeps the op/magnitude sampling
// (RNG reproducibility); C++ only executes the chosen op.
// ---------------------------------------------------------------------- //

// Op ids — MUST match the ordering of randaugment.OPS.
enum AugOp {
  AUG_IDENTITY = 0,
  AUG_AUTOCONTRAST = 1,
  AUG_EQUALIZE = 2,
  AUG_ROTATE = 3,
  AUG_SOLARIZE = 4,
  AUG_COLOR = 5,
  AUG_POSTERIZE = 6,
  AUG_CONTRAST = 7,
  AUG_BRIGHTNESS = 8,
  AUG_SHARPNESS = 9,
  AUG_SHEAR_X = 10,
  AUG_SHEAR_Y = 11,
  AUG_TRANSLATE_X = 12,
  AUG_TRANSLATE_Y = 13,
};

constexpr float kMaxLevel = 30.0f;

inline uint8_t clamp_u8(float v) {
  return (uint8_t)std::min(std::max(v, 0.0f), 255.0f);
}

// Inverse-mapped bilinear affine warp of one frame (center-relative map),
// matching randaugment._affine: x0 = clip(floor(sx)), wx = clip(sx) - x0.
// Weights in double — the numpy oracle blends float32 pixels with float64
// weights, and fractional translates put every pixel near a .5 boundary.
void warp_frame(const uint8_t* in, uint8_t* out, int H, int W, int C,
                const double m[6]) {
  const double cx = (W - 1) * 0.5, cy = (H - 1) * 0.5;
  for (int yo = 0; yo < H; ++yo) {
    const double y = yo - cy;
    for (int xo = 0; xo < W; ++xo) {
      const double x = xo - cx;
      const double sx = m[0] * x + m[1] * y + m[2] + cx;
      const double sy = m[3] * x + m[4] * y + m[5] + cy;
      int x0 = (int)std::floor(sx);
      int y0 = (int)std::floor(sy);
      x0 = std::min(std::max(x0, 0), W - 1);
      y0 = std::min(std::max(y0, 0), H - 1);
      const int x1 = std::min(x0 + 1, W - 1);
      const int y1 = std::min(y0 + 1, H - 1);
      const double wx = std::min(std::max(sx, 0.0), (double)(W - 1)) - x0;
      const double wy = std::min(std::max(sy, 0.0), (double)(H - 1)) - y0;
      const uint8_t* p00 = in + ((size_t)y0 * W + x0) * C;
      const uint8_t* p01 = in + ((size_t)y0 * W + x1) * C;
      const uint8_t* p10 = in + ((size_t)y1 * W + x0) * C;
      const uint8_t* p11 = in + ((size_t)y1 * W + x1) * C;
      uint8_t* o = out + ((size_t)yo * W + xo) * C;
      const double w00 = (1 - wx) * (1 - wy), w01 = wx * (1 - wy);
      const double w10 = (1 - wx) * wy, w11 = wx * wy;
      for (int c = 0; c < C; ++c) {
        const double v = (float)p00[c] * w00 + (float)p01[c] * w01 +
                         (float)p10[c] * w10 + (float)p11[c] * w11;
        o[c] = (uint8_t)std::min(std::max(v, 0.0), 255.0);
      }
    }
  }
}

// blend(a, b, factor) = clip(b + factor * (a - b)) — LUT-able when b const.
void apply_lut(uint8_t* clip, size_t n, int C, const uint8_t lut[][256],
               int per_channel) {
  for (size_t p = 0; p < n; ++p)
    for (int c = 0; c < C; ++c) {
      uint8_t* v = clip + p * C + c;
      *v = lut[per_channel ? c : 0][*v];
    }
}

extern "C" {

// Apply ONE RandAugment op in place on a uint8 clip [T, H, W, C].
// op: AugOp id (matches randaugment.OPS order); level/sign as in Python.
void fv_augment_op(uint8_t* clip, int T, int H, int W, int C, int op,
                   float level, float sign) {
  const size_t frame_px = (size_t)H * W;
  const size_t n_px = frame_px * T;
  const float frac = level / kMaxLevel;

  switch (op) {
    case AUG_IDENTITY:
      return;

    case AUG_ROTATE:
    case AUG_SHEAR_X:
    case AUG_SHEAR_Y:
    case AUG_TRANSLATE_X:
    case AUG_TRANSLATE_Y: {
      // expression order matches the Python oracle exactly (left-to-right)
      // so the double results are bit-identical — bilinear weights sit on
      // .5 truncation boundaries for fractional translates.
      const double lvl = (double)level, sgn = (double)sign;
      double m[6] = {1, 0, 0, 0, 1, 0};
      if (op == AUG_ROTATE) {
        // np.deg2rad(30.0 * level / 30) * sign
        const double th = 30.0 * lvl / 30.0 * (3.14159265358979323846 / 180.0)
                          * sgn;
        const double c = std::cos(th), s = std::sin(th);
        m[0] = c; m[1] = -s; m[3] = s; m[4] = c;
      } else if (op == AUG_SHEAR_X) {
        m[1] = 0.3 * lvl / 30.0 * sgn;
      } else if (op == AUG_SHEAR_Y) {
        m[3] = 0.3 * lvl / 30.0 * sgn;
      } else if (op == AUG_TRANSLATE_X) {
        m[2] = -((double)W * 0.45 * lvl / 30.0 * sgn);
      } else {
        m[5] = -((double)H * 0.45 * lvl / 30.0 * sgn);
      }
      std::vector<uint8_t> src(clip, clip + n_px * C);
      run_threaded(T, [&](int f) {
        warp_frame(src.data() + (size_t)f * frame_px * C,
                   clip + (size_t)f * frame_px * C, H, W, C, m);
      });
      return;
    }

    case AUG_BRIGHTNESS: {
      const float factor = 1.0f + 0.9f * frac * sign;
      uint8_t lut[1][256];
      for (int v = 0; v < 256; ++v) lut[0][v] = clamp_u8(factor * v);
      apply_lut(clip, n_px, C, lut, 0);
      return;
    }

    case AUG_CONTRAST: {
      const float factor = 1.0f + 0.9f * frac * sign;
      double sum = 0.0;
      for (size_t i = 0; i < n_px * C; ++i) sum += clip[i];
      const float mean = (float)(int)(sum / (double)(n_px * C));
      uint8_t lut[1][256];
      for (int v = 0; v < 256; ++v)
        lut[0][v] = clamp_u8(mean + factor * (v - mean));
      apply_lut(clip, n_px, C, lut, 0);
      return;
    }

    case AUG_COLOR: {  // blend toward the per-pixel channel mean
      const float factor = 1.0f + 0.9f * frac * sign;
      run_threaded(T, [&](int f) {
        uint8_t* fr = clip + (size_t)f * frame_px * C;
        for (size_t p = 0; p < frame_px; ++p) {
          uint8_t* px = fr + p * C;
          float s = 0;
          for (int c = 0; c < C; ++c) s += px[c];
          const float gray = (float)(uint8_t)(s / C);  // numpy: astype(u8)
          for (int c = 0; c < C; ++c)
            px[c] = clamp_u8(gray + factor * (px[c] - gray));
        }
      });
      return;
    }

    case AUG_SHARPNESS: {  // blend with PIL-SMOOTH 3x3 ([1..,5,..1]/13)
      const float factor = 1.0f + 0.9f * frac * sign;
      std::vector<uint8_t> src(clip, clip + n_px * C);
      run_threaded(T, [&](int f) {
        const uint8_t* in = src.data() + (size_t)f * frame_px * C;
        uint8_t* out = clip + (size_t)f * frame_px * C;
        for (int y = 0; y < H; ++y) {
          const int ym = std::max(y - 1, 0), yp = std::min(y + 1, H - 1);
          for (int x = 0; x < W; ++x) {
            const int xm = std::max(x - 1, 0), xp = std::min(x + 1, W - 1);
            for (int c = 0; c < C; ++c) {
              const auto at = [&](int yy, int xx) -> float {
                return in[((size_t)yy * W + xx) * C + c];
              };
              const float sm =
                  (at(ym, xm) + at(ym, x) + at(ym, xp) + at(y, xm) +
                   5.0f * at(y, x) + at(y, xp) + at(yp, xm) + at(yp, x) +
                   at(yp, xp)) / 13.0f;
              const float b = (float)clamp_u8(sm);  // numpy: clip+astype(u8)
              const float a = at(y, x);
              out[((size_t)y * W + x) * C + c] = clamp_u8(b + factor * (a - b));
            }
          }
        }
      });
      return;
    }

    case AUG_POSTERIZE: {
      const int bits = 8 - (int)(4.0f * frac);
      const uint8_t mask = (uint8_t)(256 - (1 << (8 - bits)));
      for (size_t i = 0; i < n_px * C; ++i) clip[i] &= mask;
      return;
    }

    case AUG_SOLARIZE: {
      const uint8_t threshold = (uint8_t)(255 - (int)(255.0f * frac));
      for (size_t i = 0; i < n_px * C; ++i)
        if (clip[i] >= threshold) clip[i] = 255 - clip[i];
      return;
    }

    case AUG_AUTOCONTRAST: {  // per-channel min/max over the whole clip
      std::vector<uint8_t> lo(C, 255), hi(C, 0);
      for (size_t p = 0; p < n_px; ++p)
        for (int c = 0; c < C; ++c) {
          const uint8_t v = clip[p * C + c];
          lo[c] = std::min(lo[c], v);
          hi[c] = std::max(hi[c], v);
        }
      std::vector<std::array<uint8_t, 256>> lut(C);
      for (int c = 0; c < C; ++c) {
        const float scale = 255.0f / std::max((float)(hi[c] - lo[c]), 1.0f);
        for (int v = 0; v < 256; ++v)
          lut[c][v] = clamp_u8((v - lo[c]) * scale);
      }
      for (size_t p = 0; p < n_px; ++p)
        for (int c = 0; c < C; ++c)
          clip[p * C + c] = lut[c][clip[p * C + c]];
      return;
    }

    case AUG_EQUALIZE: {  // PIL-style per-channel histogram equalization
      for (int c = 0; c < C; ++c) {
        int64_t hist[256] = {0};
        for (size_t p = 0; p < n_px; ++p) ++hist[clip[p * C + c]];
        int last_nonzero = -1;
        int n_nonzero = 0;
        int64_t total = 0;
        for (int v = 0; v < 256; ++v) {
          total += hist[v];
          if (hist[v] > 0) { last_nonzero = v; ++n_nonzero; }
        }
        if (n_nonzero <= 1) continue;
        const int64_t step = (total - hist[last_nonzero]) / 255;
        if (step == 0) continue;
        uint8_t lut[256];
        int64_t cum = 0;
        for (int v = 0; v < 256; ++v) {
          const int64_t x = cum / step;  // (cumsum - hist) // step
          lut[v] = (uint8_t)std::min<int64_t>(std::max<int64_t>(x, 0), 255);
          cum += hist[v];
        }
        for (size_t p = 0; p < n_px; ++p)
          clip[p * C + c] = lut[clip[p * C + c]];
      }
      return;
    }

    default:
      return;  // unknown op: no-op (forward compatible)
  }
}

// Patch-major wire: space-to-depth a uint8 clip [T, H, W, C] into
// [Tn*Hn*Wn, pt*ph*pw*C] (token-major rows, K index =
// ((dt*ph + dh)*pw + dw)*C + c — the contraction order of the device-side
// patchify dot_general in models/layers._PatchProj). Doing this layout on
// the host turns the device patchify into a pure MXU matmul: XLA's operand
// copy for the strided uint8 gather ran at 22.6 GiB/s (~5.5 ms/step = 5.8%
// of the flagship train step, dev/profile_step.py round 3).
// The inner copy moves pw*C contiguous bytes per (token, dt, dh) — 48-byte
// runs at the flagship (2,16,16)x3 patch — walking the input sequentially
// within each frame row band, so it runs at memcpy-like speed.
void fv_space_to_depth(const uint8_t* in, int T, int H, int W, int C,
                       int pt, int ph, int pw, uint8_t* out) {
  const int Tn = T / pt, Hn = H / ph, Wn = W / pw;
  const size_t row = (size_t)W * C;       // one input row of pixels
  const size_t frame = (size_t)H * row;   // one input frame
  const size_t run = (size_t)pw * C;      // contiguous bytes per copy
  const size_t K = (size_t)pt * ph * run; // bytes per output token row
  for (int tn = 0; tn < Tn; ++tn)
    for (int hn = 0; hn < Hn; ++hn)
      for (int dt = 0; dt < pt; ++dt)
        for (int dh = 0; dh < ph; ++dh) {
          const uint8_t* src =
              in + (size_t)(tn * pt + dt) * frame + (size_t)(hn * ph + dh) * row;
          uint8_t* dst = out + ((size_t)(tn * Hn + hn) * Wn) * K +
                         ((size_t)dt * ph + dh) * run;
          for (int wn = 0; wn < Wn; ++wn)
            std::memcpy(dst + (size_t)wn * K, src + (size_t)wn * run, run);
        }
}

// Batched variant over BN clips (threaded across clips).
void fv_space_to_depth_batch(const uint8_t* in, int BN, int T, int H, int W,
                             int C, int pt, int ph, int pw, uint8_t* out) {
  const size_t in_sz = (size_t)T * H * W * C;
  const int Tn = T / pt, Hn = H / ph, Wn = W / pw;
  const size_t out_sz = (size_t)Tn * Hn * Wn * pt * ph * pw * C;
  run_threaded(BN, [&](int i) {
    fv_space_to_depth(in + (size_t)i * in_sz, T, H, W, C, pt, ph, pw,
                      out + (size_t)i * out_sz);
  });
}

}  // extern "C"
