// Threaded row gather for memory-mapped dataset caches.
//
// The stage-1 preprocessing cache stores per-sample embedding rows in large
// mmap'd .npy stacks (flow_factory_tpu/data/dataset.py). Assembling a
// training batch means gathering B rows (each 100s of KB for T5/UMT5
// embeddings) into one contiguous buffer that jax.device_put can DMA from.
// Doing that through numpy fancy-indexing walks the Python/C boundary per
// row and single-threads the copy; this kernel fans the row copies across
// hardware threads and reads straight from the page cache.
//
// This is the runtime's native data-path (the reference delegates the
// equivalent work to HF datasets' Arrow C++ core).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread gather.cpp -o libffgather.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// Gather rows: dst[i] = src[indices[i]] for i in [0, n_rows).
// src has arbitrary leading stride (row_bytes); rows are contiguous.
void ff_gather_rows(const uint8_t* src,
                    const int64_t* indices,
                    int64_t n_rows,
                    int64_t row_bytes,
                    uint8_t* dst,
                    int32_t n_threads) {
  if (n_rows <= 0 || row_bytes <= 0) return;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int threads = n_threads > 0 ? n_threads : hw;
  threads = std::min<int64_t>(threads, n_rows);
  // Small batches: thread spawn costs more than the copy.
  if (n_rows * row_bytes < (1 << 20) || threads <= 1) {
    for (int64_t i = 0; i < n_rows; ++i) {
      std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes, row_bytes);
    }
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  int64_t chunk = (n_rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_rows, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes, row_bytes);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Fused gather + fp32 cast from bf16/fp16 rows (latent storage dtypes).
// kind: 0 = bf16 -> f32, 1 = f16 -> f32.
void ff_gather_rows_to_f32(const uint16_t* src,
                           const int64_t* indices,
                           int64_t n_rows,
                           int64_t row_elems,
                           float* dst,
                           int32_t kind,
                           int32_t n_threads) {
  if (n_rows <= 0 || row_elems <= 0) return;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int threads = n_threads > 0 ? n_threads : hw;
  threads = std::min<int64_t>(threads, n_rows);

  auto convert_row = [=](int64_t i) {
    const uint16_t* in = src + indices[i] * row_elems;
    float* out = dst + i * row_elems;
    if (kind == 0) {  // bf16: high 16 bits of f32
      for (int64_t j = 0; j < row_elems; ++j) {
        uint32_t bits = static_cast<uint32_t>(in[j]) << 16;
        std::memcpy(out + j, &bits, 4);
      }
    } else {  // f16
      for (int64_t j = 0; j < row_elems; ++j) {
        uint16_t h = in[j];
        uint32_t sign = (h & 0x8000u) << 16;
        uint32_t exp = (h >> 10) & 0x1F;
        uint32_t mant = h & 0x3FF;
        uint32_t bits;
        if (exp == 0) {
          if (mant == 0) {
            bits = sign;
          } else {  // subnormal
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; ++shift; }
            mant &= 0x3FF;
            bits = sign | ((127 - 15 - shift) << 23) | (mant << 13);
          }
        } else if (exp == 31) {
          bits = sign | 0x7F800000u | (mant << 13);
        } else {
          bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
        }
        std::memcpy(out + j, &bits, 4);
      }
    }
  };

  if (threads <= 1 || n_rows < 4) {
    for (int64_t i = 0; i < n_rows; ++i) convert_row(i);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n_rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_rows, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() { for (int64_t i = lo; i < hi; ++i) convert_row(i); });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
