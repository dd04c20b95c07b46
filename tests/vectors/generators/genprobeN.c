#include "mosfhet.h"
#include <stdio.h>
int main(){
  const int N = 2048;
  TorusPolynomial p = polynomial_new_torus_polynomial(N);
  DFT_Polynomial d = polynomial_new_DFT_polynomial(N);
  for (int i = 0; i < N; i++) p->coeffs[i] = 0;
  p->coeffs[1] = 1UL << 60;
  polynomial_torus_to_DFT(d, p);
  FILE *f = fopen("/tmp/vec2/v2_dft_probeN2048.bin", "wb");
  fwrite(d->coeffs, sizeof(double), N, f); fclose(f);
  printf("ok\n");
  return 0;
}
