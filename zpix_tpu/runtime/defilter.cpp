// Native PNG defilter.
//
// Filter semantics mirror /root/reference/src/png/decoder.zig:806-842 and
// filterPaeth (:1152-1182): per-row filter byte, wrapping adds, Paeth
// tie-break a <= b <= c.  Rows are serially dependent (previous row), the
// byte recurrences within Sub/Avg/Paeth are stride-bpp dependent; images
// in a batch are independent and decode on a thread pool.
//
// Built into libzpix_entropy.so (see runtime/__init__.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
  int p = int(a) + int(b) - int(c);
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Defilter `height` rows of (1 + row_bytes) input into out[height][row_bytes].
// Returns 0, or 1 on an invalid filter byte.
int zpix_defilter(const uint8_t* raw, int64_t height, int64_t row_bytes,
                  int32_t bpp, uint8_t* out) {
  std::vector<uint8_t> zero(row_bytes, 0);
  const uint8_t* prev = zero.data();
  for (int64_t y = 0; y < height; y++) {
    const uint8_t* in = raw + y * (row_bytes + 1);
    uint8_t* cur = out + y * row_bytes;
    uint8_t f = in[0];
    const uint8_t* src = in + 1;
    switch (f) {
      case 0:
        memcpy(cur, src, row_bytes);
        break;
      case 1:
        memcpy(cur, src, bpp < row_bytes ? bpp : row_bytes);
        for (int64_t i = bpp; i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + cur[i - bpp]);
        break;
      case 2:
        for (int64_t i = 0; i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + prev[i]);
        break;
      case 3:
        for (int64_t i = 0; i < bpp && i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + prev[i] / 2);
        for (int64_t i = bpp; i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + (int(cur[i - bpp]) + int(prev[i])) / 2);
        break;
      case 4:
        for (int64_t i = 0; i < bpp && i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + prev[i]);
        for (int64_t i = bpp; i < row_bytes; i++)
          cur[i] = uint8_t(src[i] + paeth(cur[i - bpp], prev[i], prev[i - bpp]));
        break;
      default:
        return 1;
    }
    prev = cur;
  }
  return 0;
}

// Batch variant: n independent images on a thread pool.
int zpix_defilter_batch(const uint8_t** raws, int64_t height,
                        int64_t row_bytes, int32_t bpp, uint8_t** outs,
                        int32_t n_images, int32_t n_threads) {
  std::atomic<int32_t> next{0};
  std::atomic<int32_t> err{0};
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n_images) return;
      if (zpix_defilter(raws[i], height, row_bytes, bpp, outs[i]) != 0)
        err.store(1);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return err.load();
}

}  // extern "C"
