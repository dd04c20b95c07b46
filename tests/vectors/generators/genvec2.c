// Round-2 cross-implementation vector generator (portable FFNT+SHAKE build).
// Produces: DFT-convention probes, TRLWE-KS / LUT-packing / generic(packing1)
// KS keys in the reference's save formats, and in/out samples for each.
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

int main() {
  const int N = 256, k = 1, n = 32, t = 4, base_bit = 4, torus_base = 4;
  const int l = 3, Bg_bit = 9;
  FILE *f;

  // ---- DFT convention probes ----
  TorusPolynomial p = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[0] = 1UL << 60;
  save_dft_probe("v2_dft_probe0.bin", p);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[1] = 1UL << 60;
  save_dft_probe("v2_dft_probe1.bin", p);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[7] = 3UL << 55;
  save_dft_probe("v2_dft_probe2.bin", p);
  for (int i = 0; i < N; i++)
    p->coeffs[i] = ((uint64_t)(i * i + 1)) << 40;
  save_dft_probe("v2_dft_probe3.bin", p);

  // ---- keys (sigma = 0 for exact phases) ----
  TRLWE_Key okey = trlwe_new_binary_key(N, k, 0.0);
  TRLWE_Key ikey = trlwe_new_binary_key(N, k, 0.0);
  TLWE_Key tkey = tlwe_new_binary_key(n, 0.0);
  f = fopen("v2_trlwe_okey.bin", "wb"); trlwe_save_key(f, okey); fclose(f);
  f = fopen("v2_trlwe_ikey.bin", "wb"); trlwe_save_key(f, ikey); fclose(f);
  f = fopen("v2_tlwe_key.bin", "wb"); tlwe_save_key(f, tkey); fclose(f);

  // ---- TRLWE -> TRLWE KS key (DFT-domain samples in the file) ----
  TRLWE_KS_Key rks = trlwe_new_KS_key(okey, ikey, t, base_bit);
  f = fopen("v2_trlwe_ks_key.bin", "wb"); trlwe_save_KS_key(f, rks); fclose(f);
  TorusPolynomial msg = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) msg->coeffs[i] = ((uint64_t)i) << 48;
  TRLWE cin = trlwe_new_sample(msg, ikey);
  f = fopen("v2_trlwe_ks_in.bin", "wb"); trlwe_save_sample(f, cin); fclose(f);
  TRLWE cout = trlwe_alloc_new_sample(k, N);
  trlwe_keyswitch(cout, cin, rks);
  f = fopen("v2_trlwe_ks_out.bin", "wb"); trlwe_save_sample(f, cout); fclose(f);

  // ---- LUT packing KS key (compressed samples in the file) ----
  LUT_Packing_KS_Key pk =
      trlwe_new_packing_KS_key(okey, tkey, t, base_bit, torus_base);
  f = fopen("v2_packing_ks_key.bin", "wb");
  trlwe_save_packing_KS_key(f, pk); fclose(f);
  TLWE tin[4];
  f = fopen("v2_packing_in.bin", "wb");
  for (int e = 0; e < torus_base; e++) {
    tin[e] = tlwe_new_sample(((uint64_t)(e + 1)) << 60, tkey);
    tlwe_save_sample(f, tin[e]);
  }
  fclose(f);
  TRLWE pout = trlwe_alloc_new_sample(k, N);
  trlwe_packing_keyswitch(pout, tin, pk);
  f = fopen("v2_packing_out.bin", "wb"); trlwe_save_sample(f, pout); fclose(f);

  // ---- generic (packing1) KS key ----
  Generic_KS_Key gk = trlwe_new_packing1_KS_key(okey, tkey, t, base_bit);
  f = fopen("v2_generic_ks_key.bin", "wb");
  trlwe_save_generic_ks_key(f, gk); fclose(f);
  TLWE gin = tlwe_new_sample(5UL << 60, tkey);
  f = fopen("v2_generic_in.bin", "wb"); tlwe_save_sample(f, gin); fclose(f);
  TRLWE gout = trlwe_alloc_new_sample(k, N);
  trlwe_packing1_keyswitch(gout, gin, gk);
  f = fopen("v2_generic_out.bin", "wb"); trlwe_save_sample(f, gout); fclose(f);

  // ---- bootstrap key unfold=1 (DFT-domain TRGSWs in the file) ----
  TRGSW_Key gkey = trgsw_new_key(okey, l, Bg_bit);
  Bootstrap_Key bk = new_bootstrap_key(gkey, tkey, 1);
  f = fopen("v2_bootstrap_key_u1.bin", "wb");
  save_bootstrap_key(f, bk); fclose(f);

  printf("genvec2 done\n");
  return 0;
}
