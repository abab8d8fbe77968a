// Native data-loader hot path: fused gather + normalize + horizontal flip.
//
// The reference delegates its per-batch image work to torchvision's C++ ops
// (transforms, ref:src/v1/utils.py:124-131); this is the equivalent native
// component for the TPU framework's host pipeline: given the uint8 dataset
// resident in host RAM, produce a normalized float32 batch ([-1, 1], NHWC)
// for the selected indices, with optional per-sample horizontal flip, using
// all host cores.  Called from Python via ctypes (vitgan_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread loader.cpp -o libvitgan_loader.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
  const uint8_t* images;   // (N, H, W, C) contiguous
  const int64_t* indices;  // (B,)
  const uint8_t* flip;     // (B,) or nullptr
  float* out;              // (B, H, W, C)
  int64_t h, w, c;
};

inline void copy_row_normalize(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 2.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]) * kScale - 1.0f;
}

void process_sample(const Job& job, int64_t b) {
  const int64_t hw = job.h * job.w;
  const int64_t sample_elems = hw * job.c;
  const uint8_t* src = job.images + job.indices[b] * sample_elems;
  float* dst = job.out + b * sample_elems;
  const bool do_flip = job.flip != nullptr && job.flip[b] != 0;
  if (!do_flip) {
    copy_row_normalize(src, dst, sample_elems);
    return;
  }
  // Horizontal flip: reverse the W axis of each row, keeping channels intact.
  constexpr float kScale = 2.0f / 255.0f;
  for (int64_t y = 0; y < job.h; ++y) {
    const uint8_t* row = src + y * job.w * job.c;
    float* orow = dst + y * job.w * job.c;
    for (int64_t x = 0; x < job.w; ++x) {
      const uint8_t* px = row + (job.w - 1 - x) * job.c;
      float* opx = orow + x * job.c;
      for (int64_t ch = 0; ch < job.c; ++ch)
        opx[ch] = static_cast<float>(px[ch]) * kScale - 1.0f;
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int gather_normalize(const uint8_t* images, const int64_t* indices, int64_t batch,
                     int64_t h, int64_t w, int64_t c, const uint8_t* flip,
                     float* out, int num_threads) {
  if (images == nullptr || indices == nullptr || out == nullptr) return 1;
  Job job{images, indices, flip, out, h, w, c};
  if (num_threads <= 1 || batch < 4) {
    for (int64_t b = 0; b < batch; ++b) process_sample(job, b);
    return 0;
  }
  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int64_t b = next.fetch_add(1);
      if (b >= batch) return;
      process_sample(job, b);
    }
  };
  std::vector<std::thread> threads;
  const int n = std::min<int64_t>(num_threads, batch);
  threads.reserve(n);
  for (int i = 0; i < n; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// uint8 -> float32 [-1,1] without gather (whole-array normalize).
int normalize_u8(const uint8_t* src, float* dst, int64_t n) {
  if (src == nullptr || dst == nullptr) return 1;
  copy_row_normalize(src, dst, n);
  return 0;
}

}  // extern "C"
