// AES-128 CTR keystream, implemented from FIPS-197 (software, byte-oriented).
// The reference uses AES-NI/VAES hardware AES for its A_PRNG=vaes builds
// (/root/reference/src/rnd/aes_rng.c); this portable implementation matches
// the keystream for interop and testing.
#include "mosfhet_native.h"

#include <cstring>

namespace {

uint8_t kSbox[256];
bool sbox_init_done = false;

uint8_t gf_mul(uint8_t a, uint8_t b) {
  uint8_t p = 0;
  for (int i = 0; i < 8; i++) {
    if (b & 1) p ^= a;
    bool hi = a & 0x80;
    a <<= 1;
    if (hi) a ^= 0x1B;
    b >>= 1;
  }
  return p;
}

void init_sbox() {
  if (sbox_init_done) return;
  // multiplicative inverse in GF(2^8) + affine transform (FIPS-197 5.1.1)
  uint8_t inv[256] = {0};
  for (int a = 1; a < 256; a++)
    for (int b = 1; b < 256; b++)
      if (gf_mul((uint8_t)a, (uint8_t)b) == 1) { inv[a] = (uint8_t)b; break; }
  for (int i = 0; i < 256; i++) {
    uint8_t x = inv[i], y = x;
    for (int j = 0; j < 4; j++) { y = (uint8_t)((y << 1) | (y >> 7)); x ^= y; }
    kSbox[i] = x ^ 0x63;
  }
  sbox_init_done = true;
}

struct AES128 {
  uint8_t rk[11][16];

  explicit AES128(const uint8_t key[16]) {
    init_sbox();
    std::memcpy(rk[0], key, 16);
    uint8_t rcon = 1;
    for (int r = 1; r <= 10; r++) {
      uint8_t t[4] = {rk[r - 1][12], rk[r - 1][13], rk[r - 1][14],
                      rk[r - 1][15]};
      uint8_t tmp = t[0];
      t[0] = (uint8_t)(kSbox[t[1]] ^ rcon);
      t[1] = kSbox[t[2]];
      t[2] = kSbox[t[3]];
      t[3] = kSbox[tmp];
      for (int i = 0; i < 4; i++) rk[r][i] = rk[r - 1][i] ^ t[i];
      for (int i = 4; i < 16; i++) rk[r][i] = rk[r - 1][i] ^ rk[r][i - 4];
      rcon = gf_mul(rcon, 2);
    }
  }

  void encrypt_block(const uint8_t in[16], uint8_t out[16]) const {
    uint8_t s[16];
    for (int i = 0; i < 16; i++) s[i] = in[i] ^ rk[0][i];
    for (int r = 1; r <= 10; r++) {
      uint8_t t[16];
      // SubBytes + ShiftRows (column-major state: s[4c + r_row])
      for (int c = 0; c < 4; c++)
        for (int row = 0; row < 4; row++)
          t[4 * c + row] = kSbox[s[4 * ((c + row) % 4) + row]];
      if (r < 10) {
        // MixColumns
        for (int c = 0; c < 4; c++) {
          uint8_t *col = &t[4 * c];
          uint8_t a0 = col[0], a1 = col[1], a2 = col[2], a3 = col[3];
          col[0] = gf_mul(a0, 2) ^ gf_mul(a1, 3) ^ a2 ^ a3;
          col[1] = a0 ^ gf_mul(a1, 2) ^ gf_mul(a2, 3) ^ a3;
          col[2] = a0 ^ a1 ^ gf_mul(a2, 2) ^ gf_mul(a3, 3);
          col[3] = gf_mul(a0, 3) ^ a1 ^ a2 ^ gf_mul(a3, 2);
        }
      }
      for (int i = 0; i < 16; i++) s[i] = t[i] ^ rk[r][i];
    }
    std::memcpy(out, s, 16);
  }
};

}  // namespace

extern "C" void mosfhet_aes128_ctr(const uint8_t key[16], const uint8_t iv[16],
                                   uint8_t *out, size_t nblocks) {
  AES128 aes(key);
  uint8_t ctr[16];
  std::memcpy(ctr, iv, 16);
  for (size_t b = 0; b < nblocks; b++) {
    aes.encrypt_block(ctr, out + 16 * b);
    for (int i = 15; i >= 8; i--) {   // big-endian increment, low 8 bytes
      if (++ctr[i] != 0) break;
    }
  }
}

// MOSFHET's A_PRNG=vaes counter convention (`src/rnd/aes_rng.c:128-149`):
// the counter block's HIGH u64 (bytes 8..15) is incremented as a
// little-endian integer (`_mm_add_epi64` on the high lane).
extern "C" void mosfhet_aes128_ctr_le(const uint8_t key[16],
                                      const uint8_t iv[16], uint8_t *out,
                                      size_t nblocks) {
  AES128 aes(key);
  uint8_t ctr[16];
  std::memcpy(ctr, iv, 16);
  for (size_t b = 0; b < nblocks; b++) {
    aes.encrypt_block(ctr, out + 16 * b);
    for (int i = 8; i < 16; i++) {    // little-endian increment, high u64
      if (++ctr[i] != 0) break;
    }
  }
}
