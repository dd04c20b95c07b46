/* mosfhet_tpu native runtime: host-side codecs and PRNG expansion.
 *
 * The reference implementation (antoniocgj/MOSFHET) is a native C library;
 * its host-side subsystems that matter for interop are re-implemented here
 * in fresh C++ from public specifications:
 *
 *  - xoroshiro128++ expansion in the reference's 4-lane interleaved order
 *    (behavioral spec: src/trlwe_compressed.c:5-35,72-109 of the reference;
 *    algorithm: Blackman & Vigna, public domain)
 *  - SHAKE-128/256 XOF (FIPS-202), used by the reference's USE_SHAKE builds
 *  - AES-128 CTR keystream (FIPS-197), used by the reference's VAES builds
 *
 * These let seeded (compressed) ciphertexts and key material produced by the
 * reference be expanded bit-exactly, at native speed, for import into the
 * TPU framework (multi-GiB packing keyswitch keys are the target workload).
 */
#ifndef MOSFHET_NATIVE_H
#define MOSFHET_NATIVE_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Expand a 16-byte seed into n_polys polynomials of N uint64 coefficients,
 * matching the reference's trlwe_compressed expansion order (4 interleaved
 * xoroshiro128++ lanes, state carried across polynomials).  N must be a
 * multiple of 4.  Returns 0 on success. */
int mosfhet_xoroshiro_expand(const uint8_t seed[16], uint64_t *out,
                             size_t n_polys, size_t N);

/* Scalar xoroshiro128++ stream (state updated in place), for tests. */
void mosfhet_xoroshiro_next_n(uint64_t state[2], uint64_t *out, size_t n);

/* SHAKE-128 / SHAKE-256 XOF: absorb `in` (inlen bytes), squeeze outlen
 * bytes.  One-shot; matches hashlib.shake_128/256. */
void mosfhet_shake128(const uint8_t *in, size_t inlen,
                      uint8_t *out, size_t outlen);
void mosfhet_shake256(const uint8_t *in, size_t inlen,
                      uint8_t *out, size_t outlen);

/* AES-128 CTR keystream: encrypt a zero stream under `key` with the 16-byte
 * initial counter block `iv` (big-endian increment on the last 8 bytes),
 * producing nblocks*16 bytes. */
void mosfhet_aes128_ctr(const uint8_t key[16], const uint8_t iv[16],
                        uint8_t *out, size_t nblocks);

#ifdef __cplusplus
}
#endif

#endif /* MOSFHET_NATIVE_H */
