// Round-3 deterministic-PRNG replay vectors.
//
// Built against a COPY of the reference whose `generate_rnd_seed`
// (PORTABLE_BUILD branch, `src/misc.c`) is replaced by a deterministic
// counter seed:
//   p[0] = ctr++;  p[1] = 0x1111...;  p[2] = 0x2222...;  p[3] = 0x3333...
// so the whole byte stream (SHAKE-256 expansion, 1 KiB buffered for
// draws < 512 B, direct otherwise — `misc.c:58-82`) is replayable.
// The Python replica is `mosfhet_tpu/refrng.py`; the tests assert
// bit-exact agreement for the raw stream, the Box–Muller noise sampler,
// binary keys, and full TLWE encryptions (whose b is exact integer
// arithmetic), and FFT-noise-bounded agreement for TRLWE/bootstrap
// (the reference computes a*s through its f64 FFT).
//
// Build (PORTABLE FFNT+SHAKE, $REF = patched copy):
//   gcc -o genvec_replay genvec_replay.c $REF/src/{keyswitch,bootstrap,\
//     bootstrap_ga,tlwe,trlwe,trgsw,misc,polynomial,register,\
//     sha3/fips202,fft/karatsuba,trlwe_compressed,fft/ffnt/ffnt}.c \
//     -I$REF/include -DUSE_SHAKE -DPORTABLE_BUILD -O2 -lm
#include "mosfhet.h"
#include <stdio.h>

int main() {
  const int n = 32, N = 256, k = 1, l = 2, Bg_bit = 9;
  const double s_lwe = 1.0 / (1 << 15), s_rlwe = 1.0 / (1L << 40);
  FILE *f;

  // ---- raw stream probes (fresh process: ctr starts at 0) ----
  // draw pattern crossing the buffer logic: 16 (buffered; refill #0),
  // 100 (buffered), 600 (direct), 16 (buffered), 1000 (buffered; refill),
  // 512 (direct), 3 (buffered)
  {
    uint8_t buf[1000];
    int sizes[7] = {16, 100, 600, 16, 1000, 512, 3};
    f = fopen("v3_replay_stream.bin", "wb");
    for (int i = 0; i < 7; i++) {
      generate_random_bytes(sizes[i], buf);
      fwrite(buf, 1, sizes[i], f);
    }
    fclose(f);
  }

  // ---- Box-Muller noise probe: 256 torus samples at sigma = 2^-15 ----
  {
    Torus out[256];
    generate_torus_normal_random_array(out, s_lwe, 256);
    f = fopen("v3_replay_normal.bin", "wb");
    fwrite(out, sizeof(Torus), 256, f);
    fclose(f);
  }

  // ---- keys ----
  TLWE_Key tkey = tlwe_new_binary_key(n, s_lwe);
  TRLWE_Key rkey = trlwe_new_binary_key(N, k, s_rlwe);
  f = fopen("v3_replay_tlwe_key.bin", "wb"); tlwe_save_key(f, tkey); fclose(f);
  f = fopen("v3_replay_trlwe_key.bin", "wb"); trlwe_save_key(f, rkey); fclose(f);

  // ---- TLWE encryptions (exact integer b) ----
  f = fopen("v3_replay_tlwe_samples.bin", "wb");
  for (int i = 0; i < 4; i++) {
    TLWE c = tlwe_new_sample(((uint64_t)i) << 61, tkey);
    tlwe_save_sample(f, c);
  }
  fclose(f);

  // ---- TRLWE encryption (b carries FFT noise) ----
  TorusPolynomial msg = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) msg->coeffs[i] = ((uint64_t)i) << 50;
  TRLWE cr = trlwe_new_sample(msg, rkey);
  f = fopen("v3_replay_trlwe_sample.bin", "wb");
  trlwe_save_sample(f, cr); fclose(f);

  // ---- bootstrap with everything downstream of the replayed stream ----
  TRGSW_Key gkey = trgsw_new_key(rkey, l, Bg_bit);
  Bootstrap_Key bk = new_bootstrap_key(gkey, tkey, 1);
  f = fopen("v3_replay_bootstrap_key.bin", "wb");
  save_bootstrap_key(f, bk); fclose(f);

  TLWE in = tlwe_new_sample(1UL << 61, tkey);   // m = 1/8 -> slot 1 of 4
  f = fopen("v3_replay_bs_in.bin", "wb"); tlwe_save_sample(f, in); fclose(f);

  TorusPolynomial tv = polynomial_new_torus_polynomial(N);
  // 4-slot LUT with distinct values
  for (int i = 0; i < N; i++)
    tv->coeffs[i] = ((uint64_t)(i / (N / 4) + 1)) << 59;
  TRLWE tvc = trlwe_new_noiseless_trivial_sample(tv, k, N);
  TLWE out = tlwe_alloc_sample(N * k);
  functional_bootstrap(out, tvc, in, bk, 4);
  f = fopen("v3_replay_bs_out.bin", "wb"); tlwe_save_sample(f, out); fclose(f);

  printf("genvec_replay done\n");
  return 0;
}
