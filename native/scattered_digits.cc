// Native scattered-digits data pipeline.
//
// Host-side counterpart of the on-device generator
// (spair_pytorch_tpu/data/scattered_mnist.py): scatters digit patches from a
// patch bank onto blank canvases, emitting images, pixel [x, y, w, h] bbox
// targets, and digit counts. The reference's data path is a single-threaded
// Python h5py reader (reference spair/dataloader.py:10-36) feeding a
// torch DataLoader with one worker (reference train.py:48-53); this one is
// multithreaded C++ with a splitmix64 counter-based RNG so any batch index
// is reproducible independently (no sequential RNG state), designed to keep
// a TPU fed from the host while the device runs the training step —
// the host-side alternative to generating on-device.
//
// Build: make -C native   (g++ -O3 -shared; no external dependencies)
// ABI: plain C, consumed via ctypes from spair_pytorch_tpu/data/native.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// splitmix64: counter-based, stateless per call site.
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

// uniform integer in [0, n) from a fresh hash of (seed, stream)
inline int randint(uint64_t seed, uint64_t stream, int n) {
  return static_cast<int>(splitmix64(seed ^ (stream * 0x632BE59BD9B4E019ULL)) %
                          static_cast<uint64_t>(n));
}

void generate_one(const float* bank, int n_bank, int ph, int pw,
                  int height, int width, int min_obj, int max_obj,
                  uint64_t seed, float* image, float* bbox, float* count) {
  std::memset(image, 0, sizeof(float) * height * width);
  std::memset(bbox, 0, sizeof(float) * max_obj * 4);

  const int n = min_obj + randint(seed, 1, max_obj - min_obj + 1);
  *count = static_cast<float>(n);

  for (int o = 0; o < n; ++o) {
    const uint64_t s = seed ^ splitmix64(0x100 + o);
    const int pick = randint(s, 2, n_bank);
    const int oy = randint(s, 3, height - ph + 1);
    const int ox = randint(s, 4, width - pw + 1);
    const float* patch = bank + static_cast<size_t>(pick) * ph * pw;
    for (int y = 0; y < ph; ++y) {
      float* row = image + static_cast<size_t>(oy + y) * width + ox;
      const float* prow = patch + static_cast<size_t>(y) * pw;
      for (int x = 0; x < pw; ++x) {
        row[x] = std::max(row[x], prow[x]);  // max-composite (white on black)
      }
    }
    float* bb = bbox + static_cast<size_t>(o) * 4;
    bb[0] = static_cast<float>(ox);  // x (top-left), the layout metric.mAP
    bb[1] = static_cast<float>(oy);  // consumes (reference metric.py:21-22)
    bb[2] = static_cast<float>(pw);  // w
    bb[3] = static_cast<float>(ph);  // h
  }
}

}  // namespace

extern "C" {

// images:  (batch, H, W) float32 (channel dim added host-side)
// bboxes:  (batch, max_obj, 4) float32
// counts:  (batch,) float32
void spair_generate_batch(const float* bank, int n_bank, int ph, int pw,
                          int batch, int height, int width, int min_obj,
                          int max_obj, uint64_t seed, int n_threads,
                          float* images, float* bboxes, float* counts) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= batch) return;
      generate_one(bank, n_bank, ph, pw, height, width, min_obj, max_obj,
                   splitmix64(seed) ^ splitmix64(0xABCD + i),
                   images + static_cast<size_t>(i) * height * width,
                   bboxes + static_cast<size_t>(i) * max_obj * 4,
                   counts + i);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
}

}  // extern "C"
