// Host-side checkpoint repacking (OpenMP).
//
// Converts third-party AWQ checkpoint weight layouts into awq_tpu's packed
// layout at import time — the counterpart of the reference's offline
// repacker (tinychat/offline-weight-repacker.py) and of the CUDA-oriented
// packing in awq/quantize/qmodule.py:26-65, whose interleave we must UNDO
// (it matches ldmatrix/mma fragments, meaningless on TPU).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC repack.cpp -o librepack.so
//
// All functions use C linkage for ctypes.

#include <cstdint>
#include <cstring>

namespace {

// Inverse of the reference "v2" 32-element permutation:
//   step 1: idx = 8a+2b+d (a,b in [0,4), d in [0,2)) -> 8b+2a+d
//   step 2: p = 8e+2g+h (g in [0,4), h in [0,2))     -> 8e+4h+g
// perm[orig] = packed position; inv[packed] = orig.
void v2_perm32(int *inv) {
  for (int idx = 0; idx < 32; ++idx) {
    int a = idx / 8, b = (idx % 8) / 2, d = idx % 2;
    int p1 = 8 * b + 2 * a + d;
    int e = p1 / 8, f = p1 % 8;
    int g = f / 2, h = f % 2;
    int p2 = 8 * e + 4 * h + g;
    inv[p2] = idx;
  }
}

}  // namespace

extern "C" {

// Reference TinyChat v2 packed qweight int16 [N/4, K] -> codes uint8 [N, K].
// (N = out_features, K = in_features; interleave=4, kstride=64.)
void unpack_awq_v2(const int16_t *packed, int64_t N, int64_t K,
                   uint8_t *codes) {
  int inv[32];
  v2_perm32(inv);
#pragma omp parallel for schedule(static)
  for (int64_t n4 = 0; n4 < N / 4; ++n4) {
    const uint16_t *row = (const uint16_t *)packed + n4 * K;
    for (int64_t kb = 0; kb < K / 64; ++kb) {
      for (int x = 0; x < 64; ++x) {
        uint16_t w = row[kb * 64 + x];
        for (int y = 0; y < 4; ++y) {
          uint8_t v = (w >> (4 * y)) & 0xF;
          int flat = 4 * x + y;          // = i*64 + ks
          int i = flat / 64, ks = flat % 64;
          int64_t pos = kb * 64 + ks;    // permuted column
          int64_t c = pos / 32, p2 = pos % 32;
          int64_t k = c * 32 + inv[p2];
          codes[(4 * n4 + i) * K + k] = v;
        }
      }
    }
  }
}

// AutoAWQ/HF "GEMM" qweight int32 [K, N/8] (nibble order 0,2,4,6,1,3,5,7
// along N) -> codes uint8 [K, N]. Also used by llm-awq v1 checkpoints.
void unpack_awq_gemm(const int32_t *packed, int64_t K, int64_t N,
                     uint8_t *codes) {
  static const int order[8] = {0, 2, 4, 6, 1, 3, 5, 7};
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    const uint32_t *row = (const uint32_t *)packed + k * (N / 8);
    uint8_t *out = codes + k * N;
    for (int64_t nb = 0; nb < N / 8; ++nb) {
      uint32_t w = row[nb];
      for (int s = 0; s < 8; ++s)
        out[nb * 8 + order[s]] = (w >> (4 * s)) & 0xF;
    }
  }
}

// codes uint8 [IC, OC] -> awq_tpu packed int32 [IC/8, OC].
// Layout (quant/packing.py): ic = 64c + 8s + r lives in word 8c + r,
// nibble s.
void pack_int4_tpu(const uint8_t *codes, int64_t IC, int64_t OC,
                   int32_t *packed) {
  std::memset(packed, 0, sizeof(int32_t) * (IC / 8) * OC);
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < IC / 8; ++p) {
    int64_t c = p / 8, r = p % 8;
    uint32_t *out = (uint32_t *)packed + p * OC;
    for (int s = 0; s < 8; ++s) {
      const uint8_t *src = codes + (64 * c + 8 * s + r) * OC;
      for (int64_t o = 0; o < OC; ++o)
        out[o] |= (uint32_t)(src[o] & 0xF) << (4 * s);
    }
  }
}

// codes uint8 [IC, OC] <- awq_tpu packed int32 [IC/8, OC] (inverse).
void unpack_int4_tpu(const int32_t *packed, int64_t IC, int64_t OC,
                     uint8_t *codes) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < IC / 8; ++p) {
    int64_t c = p / 8, r = p % 8;
    const uint32_t *in = (const uint32_t *)packed + p * OC;
    for (int s = 0; s < 8; ++s) {
      uint8_t *dst = codes + (64 * c + 8 * s + r) * OC;
      for (int64_t o = 0; o < OC; ++o)
        dst[o] = (in[o] >> (4 * s)) & 0xF;
    }
  }
}

}  // extern "C"
