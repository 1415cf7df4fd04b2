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
#if defined(__AVX512VBMI__) && defined(__AVX512BW__)
#include <immintrin.h>
#endif
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

// ---------------------------------------------------------------------- //
// Inverse-mapped bilinear affine warp, matching randaugment._affine:
//   sx = ((m0*x + m1*y) + m2) + cx          (double, left-to-right)
//   x0 = clip(floor(sx), 0, W-1); x1 = min(x0+1, W-1)
//   wx = clip(sx, 0, W-1) - x0              (same for y)
//   out = ((f00*w00 + f01*w01) + f10*w10) + f11*w11
// Weights stay in double — the numpy oracle blends float32 pixels with
// float64 weights, and fractional translates put every pixel near a .5
// truncation boundary, so every expression below preserves the oracle's
// evaluation order bit for bit.
//
// The sampling tables depend only on (y, x), never on the frame, so they
// are built once per output ROW and amortized over the clip's T frames
// (the per-frame work drops from ~20 double ops + clamps + floor per pixel
// to the taps themselves). The RandAugment op set further specializes:
//   * shear_x / translate_x: sy == y EXACTLY (m3 = ±0*x vanishes, and
//     (yo - cy) + cy round-trips for integer yo / half-integer cy), so
//     wy == 0 and the warp is a 1-D row blend; where x0 advances by one
//     per output pixel the source is unit-stride and the loop vectorizes.
//   * translate_y: sx == x exactly -> whole-row blend of two input rows
//     with row-constant weights, unit stride.
//   * shear_y: sx == x exactly, y0 piecewise-constant along the row ->
//     runs again give unit-stride two-row blends.
//   * rotate: general 4-tap with precomputed offsets and weights.
// The zero-weight taps the specializations drop contribute exactly +0.0
// in the oracle's sum (f >= 0, w == +0.0), so dropping them is bit-exact.
// ---------------------------------------------------------------------- //

inline uint8_t trunc_px(double v) {
  return (uint8_t)std::min(std::max(v, 0.0), 255.0);
}

// Per-row horizontal-interpolation tables (shear_x / translate_x).
struct XRow {
  std::vector<int32_t> x0, x1;
  std::vector<double> w0e, w1e;              // weights expanded to [W*C]
  std::vector<std::pair<int, int>> runs;     // maximal unit-stride [lo,hi)
};

void build_xrow(const double m[6], double cx, double y, int W, int C,
                XRow& r) {
  r.x0.resize(W);
  r.x1.resize(W);
  r.w0e.resize((size_t)W * C);
  r.w1e.resize((size_t)W * C);
  r.runs.clear();
  for (int xo = 0; xo < W; ++xo) {
    const double x = xo - cx;
    const double sx = ((m[0] * x + m[1] * y) + m[2]) + cx;
    int x0 = (int)std::floor(sx);
    x0 = std::min(std::max(x0, 0), W - 1);
    const int x1 = std::min(x0 + 1, W - 1);
    const double wx = std::min(std::max(sx, 0.0), (double)(W - 1)) - x0;
    // w00 = (1-wx)*(1-wy) with wy == 0: multiply by 1.0 is exact
    const double w0 = (1.0 - wx) * (1.0 - 0.0);
    const double w1 = wx * (1.0 - 0.0);
    r.x0[xo] = x0;
    r.x1[xo] = x1;
    for (int c = 0; c < C; ++c) {
      r.w0e[(size_t)xo * C + c] = w0;
      r.w1e[(size_t)xo * C + c] = w1;
    }
  }
  int lo = -1;
  for (int xo = 0; xo < W; ++xo) {
    const bool stride1 =
        r.x1[xo] == r.x0[xo] + 1 &&
        (lo < 0 || (xo > lo && r.x0[xo] == r.x0[xo - 1] + 1));
    if (stride1 && lo < 0) {
      lo = xo;
    } else if (!stride1 && lo >= 0) {
      r.runs.emplace_back(lo, xo);
      lo = (r.x1[xo] == r.x0[xo] + 1) ? xo : -1;
    }
  }
  if (lo >= 0) r.runs.emplace_back(lo, W);
}

// One output row from one source row (sy == y exactly for these ops).
void apply_xrow(const uint8_t* srow, uint8_t* orow, const XRow& r, int W,
                int C) {
  int x = 0;
  for (const auto& run : r.runs) {
    for (; x < run.first; ++x)  // clamped / non-contiguous columns
      for (int c = 0; c < C; ++c)
        orow[x * C + c] =
            trunc_px((double)srow[(size_t)r.x0[x] * C + c] * r.w0e[x * C] +
                     (double)srow[(size_t)r.x1[x] * C + c] * r.w1e[x * C]);
    const uint8_t* s = srow + (size_t)r.x0[run.first] * C;
    const double* w0 = r.w0e.data() + (size_t)run.first * C;
    const double* w1 = r.w1e.data() + (size_t)run.first * C;
    uint8_t* o = orow + (size_t)run.first * C;
    const int n = (run.second - run.first) * C;
    for (int j = 0; j < n; ++j)  // unit stride: vectorizes
      o[j] = trunc_px((double)s[j] * w0[j] + (double)s[j + C] * w1[j]);
    x = run.second;
  }
  for (; x < W; ++x)
    for (int c = 0; c < C; ++c)
      orow[x * C + c] =
          trunc_px((double)srow[(size_t)r.x0[x] * C + c] * r.w0e[x * C] +
                   (double)srow[(size_t)r.x1[x] * C + c] * r.w1e[x * C]);
}

// Per-row vertical-interpolation tables (shear_y; sx == x exactly).
struct YRow {
  std::vector<int32_t> y0, y1;
  std::vector<double> w0e, w1e;              // weights expanded to [W*C]
  std::vector<std::pair<int, int>> runs;     // maximal const-(y0,y1) [lo,hi)
};

void build_yrow(const double m[6], double cx, double cy, double y, int W,
                int H, int C, YRow& r) {
  r.y0.resize(W);
  r.y1.resize(W);
  r.w0e.resize((size_t)W * C);
  r.w1e.resize((size_t)W * C);
  r.runs.clear();
  for (int xo = 0; xo < W; ++xo) {
    const double x = xo - cx;
    const double sy = ((m[3] * x + m[4] * y) + m[5]) + cy;
    int y0 = (int)std::floor(sy);
    y0 = std::min(std::max(y0, 0), H - 1);
    const int y1 = std::min(y0 + 1, H - 1);
    const double wy = std::min(std::max(sy, 0.0), (double)(H - 1)) - y0;
    // w00 = (1-wx)*(1-wy) with wx == 0: (1-0) == 1.0, multiply exact
    const double w0 = (1.0 - 0.0) * (1.0 - wy);
    const double w1 = (1.0 - 0.0) * wy;
    r.y0[xo] = y0;
    r.y1[xo] = y1;
    for (int c = 0; c < C; ++c) {
      r.w0e[(size_t)xo * C + c] = w0;
      r.w1e[(size_t)xo * C + c] = w1;
    }
  }
  int lo = 0;
  for (int xo = 1; xo <= W; ++xo) {
    if (xo == W || r.y0[xo] != r.y0[lo] || r.y1[xo] != r.y1[lo]) {
      r.runs.emplace_back(lo, xo);
      lo = xo;
    }
  }
}

void apply_yrow(const uint8_t* fin, uint8_t* orow, const YRow& r, int rowlen,
                int C) {
  for (const auto& run : r.runs) {
    const uint8_t* r0 = fin + (size_t)r.y0[run.first] * rowlen;
    const uint8_t* r1 = fin + (size_t)r.y1[run.first] * rowlen;
    const int lo = run.first * C, hi = run.second * C;
    for (int j = lo; j < hi; ++j)  // unit stride: vectorizes
      orow[j] = trunc_px((double)r0[j] * r.w0e[j] + (double)r1[j] * r.w1e[j]);
  }
}

// General per-row tables (rotate): 4 taps, precomputed offsets + weights.
struct GRow {
  std::vector<int32_t> o00, o01, o10, o11;   // pixel-base offsets into frame
  std::vector<double> w00, w01, w10, w11;
};

void build_grow(const double m[6], double cx, double cy, double y, int W,
                int H, int C, GRow& r) {
  r.o00.resize(W); r.o01.resize(W); r.o10.resize(W); r.o11.resize(W);
  r.w00.resize(W); r.w01.resize(W); r.w10.resize(W); r.w11.resize(W);
  for (int xo = 0; xo < W; ++xo) {
    const double x = xo - cx;
    const double sx = ((m[0] * x + m[1] * y) + m[2]) + cx;
    const double sy = ((m[3] * x + m[4] * y) + m[5]) + cy;
    int x0 = (int)std::floor(sx);
    int y0 = (int)std::floor(sy);
    x0 = std::min(std::max(x0, 0), W - 1);
    y0 = std::min(std::max(y0, 0), H - 1);
    const int x1 = std::min(x0 + 1, W - 1);
    const int y1 = std::min(y0 + 1, H - 1);
    const double wx = std::min(std::max(sx, 0.0), (double)(W - 1)) - x0;
    const double wy = std::min(std::max(sy, 0.0), (double)(H - 1)) - y0;
    r.o00[xo] = (int32_t)((y0 * W + x0) * C);
    r.o01[xo] = (int32_t)((y0 * W + x1) * C);
    r.o10[xo] = (int32_t)((y1 * W + x0) * C);
    r.o11[xo] = (int32_t)((y1 * W + x1) * C);
    r.w00[xo] = (1 - wx) * (1 - wy);
    r.w01[xo] = wx * (1 - wy);
    r.w10[xo] = (1 - wx) * wy;
    r.w11[xo] = wx * wy;
  }
}

void apply_grow(const uint8_t* fin, uint8_t* orow, const GRow& r, int W,
                int C) {
  for (int x = 0; x < W; ++x)
    for (int c = 0; c < C; ++c) {
      const double v = ((double)fin[r.o00[x] + c] * r.w00[x] +
                        (double)fin[r.o01[x] + c] * r.w01[x]) +
                       (double)fin[r.o10[x] + c] * r.w10[x] +
                       (double)fin[r.o11[x] + c] * r.w11[x];
      orow[x * C + c] = trunc_px(v);
    }
}

// blend(a, b, factor) = clip(b + factor * (a - b)) — LUT-able when b const.
void apply_lut(uint8_t* clip, size_t n, int C, const uint8_t lut[][256],
               int per_channel) {
#if defined(__AVX512VBMI__) && defined(__AVX512BW__)
  if (!per_channel) {
    // 256-entry byte LUT as two permutex2var lookups (each covers 128
    // table bytes via the index's low 7 bits) blended on the index's top
    // bit — 64 pixels per iteration instead of a scalar gather.
    const uint8_t* lt = lut[0];
    const __m512i t0 = _mm512_loadu_si512(lt);
    const __m512i t1 = _mm512_loadu_si512(lt + 64);
    const __m512i t2 = _mm512_loadu_si512(lt + 128);
    const __m512i t3 = _mm512_loadu_si512(lt + 192);
    const size_t nbytes = n * (size_t)C;
    size_t i = 0;
    for (; i + 64 <= nbytes; i += 64) {
      const __m512i v = _mm512_loadu_si512(clip + i);
      const __m512i lo = _mm512_permutex2var_epi8(t0, v, t1);
      const __m512i hi = _mm512_permutex2var_epi8(t2, v, t3);
      const __mmask64 m = _mm512_movepi8_mask(v);  // top bit: v >= 128
      _mm512_storeu_si512(clip + i, _mm512_mask_blend_epi8(m, lo, hi));
    }
    for (; i < nbytes; ++i) clip[i] = lt[clip[i]];
    return;
  }
#endif
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
      const double cx = (W - 1) * 0.5, cy = (H - 1) * 0.5;
      const int rowlen = W * C;
      const size_t fsz = (size_t)frame_px * C;
      // Tables depend on the row only — build each once, amortize over T
      // frames (threaded across rows; see the warp-plan comment above).
      if (op == AUG_SHEAR_X || op == AUG_TRANSLATE_X) {
        run_threaded(H, [&](int yo) {
          thread_local XRow r;
          build_xrow(m, cx, (double)yo - cy, W, C, r);
          for (int f = 0; f < T; ++f)
            apply_xrow(src.data() + (size_t)f * fsz + (size_t)yo * rowlen,
                       clip + (size_t)f * fsz + (size_t)yo * rowlen, r, W, C);
        });
      } else if (op == AUG_TRANSLATE_Y) {
        // sx == x exactly; sy is row-constant -> whole-row two-row blend
        run_threaded(H, [&](int yo) {
          const double y = (double)yo - cy;
          const double sy = ((m[3] * (0.0 - cx) + m[4] * y) + m[5]) + cy;
          int y0 = (int)std::floor(sy);
          y0 = std::min(std::max(y0, 0), H - 1);
          const int y1 = std::min(y0 + 1, H - 1);
          const double wy = std::min(std::max(sy, 0.0), (double)(H - 1)) - y0;
          const double w0 = (1.0 - 0.0) * (1.0 - wy);
          const double w1 = (1.0 - 0.0) * wy;
          for (int f = 0; f < T; ++f) {
            const uint8_t* r0 = src.data() + (size_t)f * fsz + (size_t)y0 * rowlen;
            const uint8_t* r1 = src.data() + (size_t)f * fsz + (size_t)y1 * rowlen;
            uint8_t* o = clip + (size_t)f * fsz + (size_t)yo * rowlen;
            for (int j = 0; j < rowlen; ++j)  // unit stride: vectorizes
              o[j] = trunc_px((double)r0[j] * w0 + (double)r1[j] * w1);
          }
        });
      } else if (op == AUG_SHEAR_Y) {
        run_threaded(H, [&](int yo) {
          thread_local YRow r;
          build_yrow(m, cx, cy, (double)yo - cy, W, H, C, r);
          for (int f = 0; f < T; ++f)
            apply_yrow(src.data() + (size_t)f * fsz,
                       clip + (size_t)f * fsz + (size_t)yo * rowlen, r,
                       rowlen, C);
        });
      } else {  // AUG_ROTATE: general 4-tap
        run_threaded(H, [&](int yo) {
          thread_local GRow r;
          build_grow(m, cx, cy, (double)yo - cy, W, H, C, r);
          for (int f = 0; f < T; ++f)
            apply_grow(src.data() + (size_t)f * fsz,
                       clip + (size_t)f * fsz + (size_t)yo * rowlen, r, W, C);
        });
      }
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
      // Integer accumulation in u32 blocks (vectorizes; a double-accumulator
      // loop does not). Total <= 255 * n < 2^53, so the double conversion is
      // exact and the mean matches the previous double-sum bit for bit.
      uint64_t isum = 0;
      const size_t n = n_px * C;
      size_t i = 0;
      for (; i + 4096 <= n; i += 4096) {
        uint32_t s = 0;
        for (size_t k = 0; k < 4096; ++k) s += clip[i + k];
        isum += s;
      }
      for (; i < n; ++i) isum += clip[i];
      const float mean = (float)(int)((double)isum / (double)n);
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
      // Separable integer sliding sums: the 3x3 kernel is (all-ones 3x3)
      // + 4*center, every partial sum is an integer <= 13*255 = 3315, and
      // integers below 2^24 are exact in float32 — so the u16 accumulation
      // is bit-identical to the oracle's float32 sum in any order, and the
      // unit-stride vertical/horizontal passes vectorize.
      const float factor = 1.0f + 0.9f * frac * sign;
      std::vector<uint8_t> src(clip, clip + n_px * C);
      const int rowlen = W * C;
      run_threaded(T, [&](int f) {
        const uint8_t* in = src.data() + (size_t)f * frame_px * C;
        uint8_t* out = clip + (size_t)f * frame_px * C;
        thread_local std::vector<uint16_t> vsum;
        vsum.resize(rowlen);
        uint16_t* vs = vsum.data();
        for (int y = 0; y < H; ++y) {
          const uint8_t* rm = in + (size_t)std::max(y - 1, 0) * rowlen;
          const uint8_t* rc = in + (size_t)y * rowlen;
          const uint8_t* rp = in + (size_t)std::min(y + 1, H - 1) * rowlen;
          for (int i = 0; i < rowlen; ++i)  // vertical 3-tap (replicate pad)
            vs[i] = (uint16_t)((uint16_t)rm[i] + rc[i] + rp[i]);
          uint8_t* orow = out + (size_t)y * rowlen;
          const auto px = [&](int i, uint16_t total) {
            const float b = (float)clamp_u8((float)total / 13.0f);
            orow[i] = clamp_u8(b + factor * ((float)rc[i] - b));
          };
          for (int c = 0; c < C; ++c) {  // x == 0 edge: xm == x
            const int xp = std::min(1, W - 1);
            px(c, (uint16_t)(vs[c] + vs[c] + vs[xp * C + c] + 4 * rc[c]));
          }
          for (int i = C; i < (W - 1) * C; ++i)  // interior: unit stride
            px(i, (uint16_t)(vs[i - C] + vs[i] + vs[i + C] + 4 * rc[i]));
          for (int c = 0; c < C; ++c) {  // x == W-1 edge: xp == x
            const int i = (W - 1) * C + c;
            const int xm = std::max(W - 2, 0);
            px(i, (uint16_t)(vs[xm * C + c] + vs[i] + vs[i] + 4 * rc[i]));
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

    case AUG_SOLARIZE: {  // byte->byte map: express as a LUT (VBMI path)
      const uint8_t threshold = (uint8_t)(255 - (int)(255.0f * frac));
      uint8_t lut[1][256];
      for (int v = 0; v < 256; ++v)
        lut[0][v] = (uint8_t)(v >= threshold ? 255 - v : v);
      apply_lut(clip, n_px, C, lut, 0);
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
