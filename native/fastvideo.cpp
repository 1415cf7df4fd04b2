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
#include <atomic>
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

// Separable bilinear: vertical blend into a row buffer, then horizontal.
void resize_frame(const uint8_t* in, const ResizePlan& p, int C, float* out,
                  std::vector<float>& rowbuf) {
  const int W = p.W, ow = p.ow;
  rowbuf.resize((size_t)W * C);
  for (int y = 0; y < p.oh; ++y) {
    const uint8_t* row0 = in + (size_t)p.y0[y] * W * C;
    const uint8_t* row1 = in + (size_t)p.y1[y] * W * C;
    const float wy = p.wy[y];
    float* rb = rowbuf.data();
    const int n = W * C;
    for (int i = 0; i < n; ++i) rb[i] = lerp(row0[i], row1[i], wy);
    float* orow = out + (size_t)y * ow * C;
    for (int x = 0; x < ow; ++x) {
      const float* a = rb + (size_t)p.x0[x] * C;
      const float* b = rb + (size_t)p.x1[x] * C;
      const float wx = p.wx[x];
      for (int c = 0; c < C; ++c) orow[x * C + c] = lerp(a[c], b[c], wx);
    }
  }
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
