// AES-CTR (A_PRNG=vaes) compressed-sample vector with a FIXED process key.
#include "mosfhet.h"
#include <stdio.h>
void setup_aes_prgn_key(__m128i * seed);
int main(){
  const int N = 256, k = 1;
  uint8_t aes_key[32] = {1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,
                         0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0};
  setup_aes_prgn_key((__m128i*) aes_key);
  TRLWE_Key key = trlwe_new_binary_key(N, k, 0.0);
  FILE *f = fopen("v2_vaes_trlwe_key.bin", "wb");
  trlwe_save_key(f, key); fclose(f);
  TorusPolynomial msg = polynomial_new_torus_polynomial(N);
  for (int i = 0; i < N; i++) msg->coeffs[i] = ((uint64_t)(3*i+1)) << 47;
  TRLWE c = trlwe_new_compressed_sample(msg, key);
  f = fopen("v2_vaes_compressed.bin", "wb");
  trlwe_save_compressed_sample(f, c); fclose(f);
  printf("vaes vector done\n");
  return 0;
}
