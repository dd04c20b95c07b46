"""Parameter sets as first-class named configs.

The reference hard-codes security/crypto parameters as consts in each harness
(`test/tests.c:36-63`, `test/benchmark.c:49-76`, `applications/.../ufhe.c:18-20`);
here they are a frozen dataclass + registry so tests can run a pass/fail
matrix per parameter set.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class TFHEParams:
    """TFHE parameter set.

    Attributes mirror the reference's per-harness consts:
      n        : LWE dimension (`tests.c:40` etc.)
      N        : ring/polynomial dimension, power of two
      k        : number of mask polynomials in TRLWE
      l        : gadget (TRGSW) decomposition length
      Bg_bit   : gadget base bits (Bg = 2**Bg_bit)
      t        : key-switching decomposition length
      base_bit : key-switching base bits
      lwe_sigma, rlwe_sigma : noise std-dev as fraction of the torus
    """

    n: int
    N: int
    k: int
    l: int
    Bg_bit: int
    t: int
    base_bit: int
    lwe_sigma: float
    rlwe_sigma: float
    name: str = ""

    @property
    def log_N(self) -> int:
        return int(math.log2(self.N))

    @property
    def log_N2(self) -> int:
        """log2(2N) — the blind-rotate exponent precision (`bootstrap.c:108`)."""
        return self.log_N + 1

    @property
    def Bg(self) -> int:
        return 1 << self.Bg_bit

    @property
    def base(self) -> int:
        return 1 << self.base_bit

    def __post_init__(self):
        assert self.N & (self.N - 1) == 0, "N must be a power of two"
        assert self.l * self.Bg_bit <= 64
        assert self.t * self.base_bit <= 64


# --- Registry -----------------------------------------------------------
# SET_1/2/3 from eprint 2022/704 table 4 and the TFHEpp Level-2 default,
# exactly as in the reference's test harness (`test/tests.c:36-63`).

SET_1 = TFHEParams(
    n=585, N=1024, k=1, l=2, Bg_bit=8, t=5, base_bit=2,
    lwe_sigma=9.141776004202573e-5, rlwe_sigma=2.989040792967434e-8,
    name="SET_1",
)

SET_2 = TFHEParams(
    n=744, N=2048, k=1, l=1, Bg_bit=23, t=5, base_bit=3,
    lwe_sigma=7.747831515176779e-6, rlwe_sigma=2.2148688116005568e-16,
    name="SET_2",
)

SET_3 = TFHEParams(
    n=807, N=4096, k=1, l=1, Bg_bit=22, t=5, base_bit=3,
    lwe_sigma=1.0562341599676662e-6, rlwe_sigma=2.168404344971009e-19,
    name="SET_3",
)

# TFHEpp Level-2: the reference's default test/bench parameters
# (`test/tests.c:50-62`, `test/benchmark.c:63-76`).
TFHEPP_L2 = TFHEParams(
    n=632, N=2048, k=1, l=4, Bg_bit=9, t=8, base_bit=4,
    lwe_sigma=3.0517578125e-05,        # 2^-15
    rlwe_sigma=5.684341886080802e-14,  # 2^-44
    name="TFHEPP_L2",
)

# ufhe application keyset (`applications/multi-ciphertext-arith/src/ufhe.c:18-20`).
UFHE_SET0 = TFHEParams(
    n=630, N=2048, k=1, l=6, Bg_bit=7, t=6, base_bit=2,
    lwe_sigma=3.0517578125e-05,        # 2^-15
    rlwe_sigma=5.684341886080802e-14,  # 2^-44
    name="UFHE_SET0",
)

# Tiny parameters for fast unit tests (no security; noise budgets scaled so
# the same functional assertions hold at small N).
TOY = TFHEParams(
    n=16, N=64, k=1, l=4, Bg_bit=9, t=8, base_bit=4,
    lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44,
    name="TOY",
)

# Slightly larger toy with k=2 to exercise the multi-mask code paths.
TOY_K2 = TFHEParams(
    n=16, N=64, k=2, l=3, Bg_bit=8, t=6, base_bit=4,
    lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44,
    name="TOY_K2",
)

PARAM_REGISTRY = {
    p.name: p for p in (SET_1, SET_2, SET_3, TFHEPP_L2, UFHE_SET0, TOY, TOY_K2)
}


def get_params(name: str) -> TFHEParams:
    return PARAM_REGISTRY[name]
