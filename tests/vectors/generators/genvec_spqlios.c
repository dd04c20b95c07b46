// Round-3 cross-implementation vector generator, DEFAULT build
// (FFT_LIB=spqlios_avx512): DFT-convention probes at two sizes plus
// DFT-stored keys/samples, to fit and verify the SPQLIOS f64-DFT wire
// format (the reference's default on-disk layout for DFT keys,
// `fft_processor_spqlios.c:81-178`).
//
// Build (reference tree copied to $REF, AVX-512 machine):
//   gcc -o genvec_spqlios genvec_spqlios.c $REF/src/{keyswitch,bootstrap,\
//     bootstrap_ga,tlwe,trlwe,trgsw,misc,polynomial,register,\
//     sha3/fips202,fft/karatsuba,trlwe_compressed_vaes,rnd/aes_rng}.c \
//     $REF/src/fft/spqlios/{spqlios-fft-avx512.s,spqlios-ifft-avx512.s,\
//     spqlios-fft-impl-avx512.c,fft_processor_spqlios.c} \
//     -I$REF/include -DUSE_COMPRESSED_TRLWE -DVAES_OPT -DUSE_SPQLIOS \
//     -DAVX512_OPT -O2 -march=native -lm
#include "mosfhet.h"
#include <stdio.h>

static void save_dft_probe(const char *path, TorusPolynomial p) {
  DFT_Polynomial d = polynomial_new_DFT_polynomial(p->N);
  polynomial_torus_to_DFT(d, p);
  FILE *f = fopen(path, "wb");
  fwrite(p->coeffs, sizeof(Torus), p->N, f);
  fwrite(d->coeffs, sizeof(double), p->N, f);
  fclose(f);
}

static void probes_at(int N, const char *tag) {
  char path[256];
  TorusPolynomial p = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[0] = 1UL << 60;
  snprintf(path, sizeof path, "v3_sp_probe0_%s.bin", tag);
  save_dft_probe(path, p);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[1] = 1UL << 60;
  snprintf(path, sizeof path, "v3_sp_probe1_%s.bin", tag);
  save_dft_probe(path, p);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[7] = 3UL << 55;
  snprintf(path, sizeof path, "v3_sp_probe2_%s.bin", tag);
  save_dft_probe(path, p);
  for (int i = 0; i < N; i++)
    p->coeffs[i] = ((uint64_t)(i * i + 1)) << 40;
  snprintf(path, sizeof path, "v3_sp_probe3_%s.bin", tag);
  save_dft_probe(path, p);
  free_polynomial(p);
}

int main() {
  const int N = 256, k = 1, t = 4, base_bit = 4;
  const int l = 3, Bg_bit = 9;
  const int n = 32;
  FILE *f;

  probes_at(256, "N256");
  probes_at(2048, "N2048");

  // ---- keys (sigma = 0 for exact phases) ----
  TRLWE_Key okey = trlwe_new_binary_key(N, k, 0.0);
  TRLWE_Key ikey = trlwe_new_binary_key(N, k, 0.0);
  TLWE_Key tkey = tlwe_new_binary_key(n, 0.0);
  f = fopen("v3_sp_trlwe_okey.bin", "wb"); trlwe_save_key(f, okey); fclose(f);
  f = fopen("v3_sp_trlwe_ikey.bin", "wb"); trlwe_save_key(f, ikey); fclose(f);
  f = fopen("v3_sp_tlwe_key.bin", "wb"); tlwe_save_key(f, tkey); fclose(f);

  // ---- a DFT-form TRLWE sample (trlwe_save_DFT_sample layout) ----
  TorusPolynomial msg = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) msg->coeffs[i] = ((uint64_t)i) << 48;
  TRLWE cin = trlwe_new_sample(msg, ikey);
  f = fopen("v3_sp_trlwe_sample.bin", "wb"); trlwe_save_sample(f, cin); fclose(f);
  TRLWE_DFT cdft = trlwe_alloc_new_DFT_sample(k, N);
  trlwe_to_DFT(cdft, cin);
  f = fopen("v3_sp_trlwe_dft_sample.bin", "wb");
  trlwe_save_DFT_sample(f, cdft); fclose(f);

  // ---- TRLWE -> TRLWE KS key (DFT-domain samples in the file) ----
  TRLWE_KS_Key rks = trlwe_new_KS_key(okey, ikey, t, base_bit);
  f = fopen("v3_sp_trlwe_ks_key.bin", "wb"); trlwe_save_KS_key(f, rks); fclose(f);
  TRLWE cout = trlwe_alloc_new_sample(k, N);
  trlwe_keyswitch(cout, cin, rks);
  f = fopen("v3_sp_trlwe_ks_out.bin", "wb"); trlwe_save_sample(f, cout); fclose(f);

  // ---- bootstrap key unfold=1 (DFT-domain TRGSWs in the file) ----
  TRGSW_Key gkey = trgsw_new_key(okey, l, Bg_bit);
  Bootstrap_Key bk = new_bootstrap_key(gkey, tkey, 1);
  f = fopen("v3_sp_bootstrap_key_u1.bin", "wb");
  save_bootstrap_key(f, bk); fclose(f);

  printf("genvec_spqlios done\n");
  return 0;
}
