// Native host preprocessing: threaded uint8 image resize kernels.
//
// The reference leans on OpenCV (cv2.resize) inside torch DataLoader worker
// processes for its geometric preprocessing (reference train.py:35-54 via
// albumentations). Our loader uses threads, where Python-level cv2 calls
// still serialize on callback overhead; this library provides the two
// resize kernels the pipeline needs (bilinear for images, nearest for
// masks) as pure C with an internal thread pool over batch items, releasing
// the GIL for the whole batch.
//
// Conventions match cv2: half-pixel centers (src = (dst + 0.5) * scale -
// 0.5), edge clamping, round-half-away for the final uint8 store.
//
// Build: python -m fmc_uia_tpu.native.build  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

static inline double src_coord(int dst, double scale) {
  return (static_cast<double>(dst) + 0.5) * scale - 0.5;
}

// Bilinear resize one HWC uint8 image.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int ch,
                        uint8_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    double fx = src_coord(x, sx);
    int x0 = static_cast<int>(std::floor(fx));
    float wx = static_cast<float>(fx - x0);
    x0s[x] = std::clamp(x0, 0, sw - 1);
    x1s[x] = std::clamp(x0 + 1, 0, sw - 1);
    wxs[x] = wx < 0.f ? 0.f : (wx > 1.f ? 1.f : wx);
  }
  for (int y = 0; y < dh; ++y) {
    double fy = src_coord(y, sy);
    int y0 = static_cast<int>(std::floor(fy));
    float wy = static_cast<float>(fy - y0);
    wy = wy < 0.f ? 0.f : (wy > 1.f ? 1.f : wy);
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    const uint8_t* row0 = src + static_cast<size_t>(y0c) * sw * ch;
    const uint8_t* row1 = src + static_cast<size_t>(y1c) * sw * ch;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = row0 + static_cast<size_t>(x0s[x]) * ch;
      const uint8_t* p01 = row0 + static_cast<size_t>(x1s[x]) * ch;
      const uint8_t* p10 = row1 + static_cast<size_t>(x0s[x]) * ch;
      const uint8_t* p11 = row1 + static_cast<size_t>(x1s[x]) * ch;
      float wx = wxs[x];
      for (int c = 0; c < ch; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        float val = top + (bot - top) * wy;
        out[static_cast<size_t>(x) * ch + c] =
            static_cast<uint8_t>(std::lround(val));
      }
    }
  }
}

// Nearest-neighbor resize one HWC uint8 image (mask-safe).
void resize_nearest_u8(const uint8_t* src, int sh, int sw, int ch,
                       uint8_t* dst, int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  std::vector<int> xs(dw);
  for (int x = 0; x < dw; ++x) {
    // cv2 INTER_NEAREST uses floor(x * scale)
    xs[x] = std::min(static_cast<int>(std::floor(x * sx)), sw - 1);
  }
  for (int y = 0; y < dh; ++y) {
    int ys = std::min(static_cast<int>(std::floor(y * sy)), sh - 1);
    const uint8_t* row = src + static_cast<size_t>(ys) * sw * ch;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      std::memcpy(out + static_cast<size_t>(x) * ch,
                  row + static_cast<size_t>(xs[x]) * ch, ch);
    }
  }
}

// Batched resize with an internal thread pool. images: array of pointers.
void resize_batch_u8(const uint8_t** srcs, const int* shs, const int* sws,
                     int ch, uint8_t* dst, int n, int dh, int dw,
                     int bilinear, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const size_t out_stride = static_cast<size_t>(dh) * dw * ch;
  auto work = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      if (bilinear) {
        resize_bilinear_u8(srcs[i], shs[i], sws[i], ch,
                           dst + i * out_stride, dh, dw);
      } else {
        resize_nearest_u8(srcs[i], shs[i], sws[i], ch,
                          dst + i * out_stride, dh, dw);
      }
    }
  };
  if (num_threads == 1 || n <= 1) {
    work(0, 1);
    return;
  }
  std::vector<std::thread> threads;
  int t = std::min(num_threads, n);
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(work, i, t);
  for (auto& th : threads) th.join();
}

}  // extern "C"
