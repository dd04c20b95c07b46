// xoroshiro128++ 1.0 (Blackman & Vigna, public domain) and the reference's
// 4-lane interleaved expansion order for seeded TRLWE samples (behavioral
// spec: /root/reference/src/trlwe_compressed.c:5-35,72-99).
#include "mosfhet_native.h"

#include <cstring>

namespace {

inline uint64_t rotl64(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

inline uint64_t xoro_next(uint64_t s[2]) {
  const uint64_t s0 = s[0];
  uint64_t s1 = s[1];
  const uint64_t result = rotl64(s0 + s1, 17) + s0;
  s1 ^= s0;
  s[0] = rotl64(s0, 49) ^ s1 ^ (s1 << 21);
  s[1] = rotl64(s1, 28);
  return result;
}

}  // namespace

extern "C" void mosfhet_xoroshiro_next_n(uint64_t state[2], uint64_t *out,
                                         size_t n) {
  for (size_t i = 0; i < n; i++) out[i] = xoro_next(state);
}

extern "C" int mosfhet_xoroshiro_expand(const uint8_t seed[16], uint64_t *out,
                                        size_t n_polys, size_t N) {
  if (N % 4 != 0) return -1;
  // Lane-state derivation: iterate the scalar generator on the raw seed,
  // interleaving s0/s1 per lane (matches the reference's seed[0][i]/
  // seed[1][i] = next(seedi) loop).
  uint64_t seed_state[2];
  std::memcpy(seed_state, seed, 16);
  uint64_t s0[4], s1[4];
  for (int i = 0; i < 4; i++) {
    s0[i] = xoro_next(seed_state);
    s1[i] = xoro_next(seed_state);
  }
  const size_t total = n_polys * N;
  for (size_t j = 0; j < total; j += 4) {
    uint64_t t1[4];
    for (int i = 0; i < 4; i++) out[j + i] = rotl64(s0[i] + s1[i], 17) + s0[i];
    for (int i = 0; i < 4; i++) t1[i] = s0[i] ^ s1[i];
    for (int i = 0; i < 4; i++) s0[i] = rotl64(s0[i], 49) ^ t1[i] ^ (t1[i] << 21);
    for (int i = 0; i < 4; i++) s1[i] = rotl64(t1[i], 28);
  }
  return 0;
}
