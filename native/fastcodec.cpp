// fastcodec: multithreaded raster codec for the host IO path.
//
// The production pipeline moves hundreds of MB of raster data per tile
// through deflate (GeoTIFF strips, HDF5-adjacent artifacts) and the
// uint16 <-> float32 reflectance codec. Python/zlib runs these single-
// threaded; this library fans strips out over a std::thread pool.
//
// C ABI (ctypes-friendly):
//   fc_deflate_strips:  compress N equal strips of a buffer in parallel
//   fc_inflate_strips:  decompress N strips in parallel
//   fc_u16_to_f32:      uint16 x 65535 -> float32 [0, 1] (parallel)
//   fc_f32_to_u16:      float32 [0, 1] -> uint16 (parallel, truncating)
//
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC ... -lz)
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

int compress_one(const uint8_t* src, size_t src_len, uint8_t* dst,
                 size_t dst_cap, size_t* out_len, int level) {
  uLongf dlen = static_cast<uLongf>(dst_cap);
  int rc = compress2(dst, &dlen, src, static_cast<uLong>(src_len), level);
  *out_len = static_cast<size_t>(dlen);
  return rc;
}

int decompress_one(const uint8_t* src, size_t src_len, uint8_t* dst,
                   size_t dst_cap, size_t* out_len) {
  uLongf dlen = static_cast<uLongf>(dst_cap);
  int rc = uncompress(dst, &dlen, src, static_cast<uLong>(src_len));
  *out_len = static_cast<size_t>(dlen);
  return rc;
}

template <typename Fn>
void parallel_for(int n, int n_threads, Fn&& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> pool;
  int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * per;
    int hi = std::min(n, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([lo, hi, &fn] {
      for (int i = lo; i < hi; ++i) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Compress `n_strips` equal-length strips of `src`. Each strip's
// compressed bytes land at dst + i * strip_cap; lengths in out_lens.
// Returns 0 on success.
int fc_deflate_strips(const uint8_t* src, size_t strip_len, int n_strips,
                      uint8_t* dst, size_t strip_cap, size_t* out_lens,
                      int level, int n_threads) {
  std::vector<int> rcs(n_strips, 0);
  parallel_for(n_strips, n_threads, [&](int i) {
    rcs[i] = compress_one(src + static_cast<size_t>(i) * strip_len,
                          strip_len, dst + static_cast<size_t>(i) * strip_cap,
                          strip_cap, &out_lens[i], level);
  });
  for (int rc : rcs)
    if (rc != Z_OK) return rc;
  return 0;
}

// Decompress strips at src + offsets[i] (lengths in_lens[i]) into
// dst + i * strip_len. Returns 0 on success.
int fc_inflate_strips(const uint8_t* src, const size_t* offsets,
                      const size_t* in_lens, int n_strips, uint8_t* dst,
                      size_t strip_len, int n_threads) {
  std::vector<int> rcs(n_strips, 0);
  parallel_for(n_strips, n_threads, [&](int i) {
    size_t got = 0;
    rcs[i] = decompress_one(src + offsets[i], in_lens[i],
                            dst + static_cast<size_t>(i) * strip_len,
                            strip_len, &got);
    if (rcs[i] == Z_OK && got != strip_len) rcs[i] = Z_DATA_ERROR;
  });
  for (int rc : rcs)
    if (rc != Z_OK) return rc;
  return 0;
}

void fc_u16_to_f32(const uint16_t* src, float* dst, size_t n,
                   int n_threads) {
  const float scale = 1.0f / 65535.0f;
  int chunks = n_threads > 0 ? n_threads : 1;
  size_t per = (n + chunks - 1) / chunks;
  parallel_for(chunks, n_threads, [&](int c) {
    size_t lo = static_cast<size_t>(c) * per;
    size_t hi = std::min(n, lo + per);
    for (size_t i = lo; i < hi; ++i) dst[i] = src[i] * scale;
  });
}

void fc_f32_to_u16(const float* src, uint16_t* dst, size_t n,
                   int n_threads) {
  int chunks = n_threads > 0 ? n_threads : 1;
  size_t per = (n + chunks - 1) / chunks;
  parallel_for(chunks, n_threads, [&](int c) {
    size_t lo = static_cast<size_t>(c) * per;
    size_t hi = std::min(n, lo + per);
    for (size_t i = lo; i < hi; ++i) {
      float v = src[i];
      v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
      dst[i] = static_cast<uint16_t>(v * 65535.0f);
    }
  });
}

}  // extern "C"
