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
//   fc_encode_s2_compact: the compact-wire S2 encoder (ttc/io/wire.py)
//                       as a fused native pass — the numpy version
//                       costs ~1.9 s/tile of 1-core time at production
//                       geometry and was the pipelined path's prepare
//                       floor (round-4 verdict item 1b)
//
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC ... -lz)
#include <algorithm>
#include <cmath>
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

// Compact-wire S2 encoder (see ttc/io/wire.py::encode_s2_compact for
// the format contract; reference wire being replaced:
// src/tof/tof_downloading.py:51-72 full-range uint16).
//
// src:  (T, H, W, B) uint16 reflectance x 65535, C-contiguous
// data: (T+1, H, W, B) int8 out — slot 0 the quantized median
//       reference plane, slots 1..T the sqrt-companded residuals
// sc:   (T+2, B) float32 out — row 0 band means, row 1 reference
//       scales, rows 2..T+1 per-(date, band) residual scales
//
// Float32 arithmetic mirrors the numpy encoder; outputs may differ by
// one quantization level at rounding boundaries (both are valid
// encodings — the scales ride the wire, and the drift gate
// tests/test_wire_gate.py bounds the decoded error either way).
void fc_encode_s2_compact(const uint16_t* src, int t, int h, int w,
                          int b, int8_t* data, float* sc,
                          int n_threads) {
  const size_t plane = static_cast<size_t>(h) * w * b;
  const size_t npx = static_cast<size_t>(h) * w;
  const float inv16 = 1.0f / 65535.0f;

  // Pass 1: per-pixel temporal median of the uint16 stack (float
  // median == uint16 median / 65535 up to one rounding of the
  // even-T midpoint mean), with per-band double accumulation for the
  // band means.
  std::vector<float> med(plane);
  std::vector<double> band_sum(static_cast<size_t>(n_threads < 1 ? 1 : n_threads) * b, 0.0);
  int chunks = n_threads > 0 ? n_threads : 1;
  size_t per = (npx + chunks - 1) / chunks;
  parallel_for(chunks, n_threads, [&](int c) {
    uint16_t v[64];
    double* bs = &band_sum[static_cast<size_t>(c) * b];
    size_t lo = static_cast<size_t>(c) * per;
    size_t hi = std::min(npx, lo + per);
    for (size_t p = lo; p < hi; ++p) {
      for (int bb = 0; bb < b; ++bb) {
        size_t base = p * b + bb;
        for (int tt = 0; tt < t; ++tt) v[tt] = src[tt * plane + base];
        std::sort(v, v + t);
        float m;
        if (t & 1) {
          m = v[t / 2] * inv16;
        } else {
          m = (v[t / 2 - 1] * inv16 + v[t / 2] * inv16) * 0.5f;
        }
        med[base] = m;
        bs[bb] += m;
      }
    }
  });

  // Band means + reference scales (serial: O(H*W*B) over the small
  // median buffer).
  std::vector<float> mean_b(b), ref_scale(b, 1e-6f);
  for (int bb = 0; bb < b; ++bb) {
    double s = 0.0;
    for (int c = 0; c < chunks; ++c) s += band_sum[static_cast<size_t>(c) * b + bb];
    mean_b[bb] = static_cast<float>(s / static_cast<double>(npx));
  }
  for (size_t p = 0; p < npx; ++p)
    for (int bb = 0; bb < b; ++bb) {
      float d = std::fabs(med[p * b + bb] - mean_b[bb]);
      if (d > ref_scale[bb]) ref_scale[bb] = d;
    }

  // Reference plane: quantize, then decode in place (the residuals
  // are against the DECODED reference, so quantization error in the
  // reference never compounds).
  parallel_for(chunks, n_threads, [&](int c) {
    size_t lo = static_cast<size_t>(c) * per;
    size_t hi = std::min(npx, lo + per);
    for (size_t p = lo; p < hi; ++p)
      for (int bb = 0; bb < b; ++bb) {
        size_t i = p * b + bb;
        float q = nearbyintf((med[i] - mean_b[bb]) / ref_scale[bb]
                             * 127.0f);
        data[i] = static_cast<int8_t>(q);
        med[i] = mean_b[bb] + ref_scale[bb] * q / 127.0f;  // ref_dec
      }
  });
  for (int bb = 0; bb < b; ++bb) {
    sc[bb] = mean_b[bb];
    sc[b + bb] = ref_scale[bb];
  }

  // Passes 2+3 per date plane: residual scale (per-band max |r|),
  // then the sqrt-companded int8 quantization. Each plane stays hot
  // in cache between the two sweeps.
  parallel_for(t, n_threads, [&](int tt) {
    const uint16_t* sp = src + static_cast<size_t>(tt) * plane;
    int8_t* dp = data + static_cast<size_t>(tt + 1) * plane;
    float rmax[64];
    for (int bb = 0; bb < b; ++bb) rmax[bb] = 1e-6f;
    for (size_t p = 0; p < npx; ++p)
      for (int bb = 0; bb < b; ++bb) {
        size_t i = p * b + bb;
        float r = std::fabs(sp[i] * inv16 - med[i]);
        if (r > rmax[bb]) rmax[bb] = r;
      }
    float inv_rs[64];
    for (int bb = 0; bb < b; ++bb) {
      sc[static_cast<size_t>(tt + 2) * b + bb] = rmax[bb];
      inv_rs[bb] = 1.0f / rmax[bb];
    }
    for (size_t p = 0; p < npx; ++p)
      for (int bb = 0; bb < b; ++bb) {
        size_t i = p * b + bb;
        float r = sp[i] * inv16 - med[i];
        float q = nearbyintf(copysignf(
            127.0f * sqrtf(std::fabs(r) * inv_rs[bb]), r));
        dp[i] = static_cast<int8_t>(q);
      }
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
