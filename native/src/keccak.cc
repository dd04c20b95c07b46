// SHAKE-128/256 XOF, implemented from the FIPS-202 specification.
// (The reference vendors Kyber's fips202.c; this is a fresh implementation.)
#include "mosfhet_native.h"

#include <cstring>

namespace {

constexpr uint64_t kRC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

// rotation offsets r[x][y] and the pi permutation, FIPS-202 section 3.2
constexpr int kRho[25] = {
    0,  1,  62, 28, 27,   // y = 0
    36, 44, 6,  55, 20,   // y = 1
    3,  10, 43, 25, 39,   // y = 2
    41, 45, 15, 21, 8,    // y = 3
    18, 2,  61, 56, 14,   // y = 4
};

inline uint64_t rotl64(uint64_t x, int k) {
  return k == 0 ? x : (x << k) | (x >> (64 - k));
}

void keccak_f1600(uint64_t a[25]) {
  for (int round = 0; round < 24; round++) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int y = 0; y < 5; y++)
      for (int x = 0; x < 5; x++) a[5 * y + x] ^= d[x];
    // rho + pi
    uint64_t b[25];
    for (int y = 0; y < 5; y++)
      for (int x = 0; x < 5; x++) {
        int nx = y, ny = (2 * x + 3 * y) % 5;
        b[5 * ny + nx] = rotl64(a[5 * y + x], kRho[5 * y + x]);
      }
    // chi
    for (int y = 0; y < 5; y++)
      for (int x = 0; x < 5; x++)
        a[5 * y + x] =
            b[5 * y + x] ^ ((~b[5 * y + (x + 1) % 5]) & b[5 * y + (x + 2) % 5]);
    // iota
    a[0] ^= kRC[round];
  }
}

void shake(const uint8_t *in, size_t inlen, uint8_t *out, size_t outlen,
           size_t rate) {
  uint64_t st[25] = {0};
  uint8_t *bytes = reinterpret_cast<uint8_t *>(st);
  // absorb (little-endian state layout)
  while (inlen >= rate) {
    for (size_t i = 0; i < rate; i++) bytes[i] ^= in[i];
    keccak_f1600(st);
    in += rate;
    inlen -= rate;
  }
  for (size_t i = 0; i < inlen; i++) bytes[i] ^= in[i];
  bytes[inlen] ^= 0x1F;          // SHAKE domain separation + pad10*1 start
  bytes[rate - 1] ^= 0x80;       // pad10*1 end
  // squeeze
  for (;;) {
    keccak_f1600(st);
    size_t n = outlen < rate ? outlen : rate;
    std::memcpy(out, bytes, n);
    out += n;
    outlen -= n;
    if (outlen == 0) break;
  }
}

}  // namespace

extern "C" void mosfhet_shake128(const uint8_t *in, size_t inlen,
                                 uint8_t *out, size_t outlen) {
  shake(in, inlen, out, outlen, 168);
}

extern "C" void mosfhet_shake256(const uint8_t *in, size_t inlen,
                                 uint8_t *out, size_t outlen) {
  shake(in, inlen, out, outlen, 136);
}
