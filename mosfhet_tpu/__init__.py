"""mosfhet_tpu — a TPU-native TFHE (FHE over the torus) framework.

A from-scratch JAX/XLA implementation of the capability set of MOSFHET
(antoniocgj/MOSFHET): TLWE/TRLWE/TRGSW ciphertext algebra, key switching,
programmable bootstrapping and its many variants — redesigned for TPU:

- Exact negacyclic NTT modulo 31-bit Proth primes with CRT readback to
  uint64, instead of the reference's float64 FFT (``src/fft/*``).  All
  ciphertext arithmetic is exact wraparound u64; there is *zero* transform
  noise (the reference tolerates ~2^-40 relative FFT error).
- A leading batch axis on every ciphertext: throughput comes from batching
  thousands of independent bootstraps per chip and sharding the batch over a
  ``jax.sharding.Mesh``, not from SIMD like the reference's AVX-512 paths.
- Keys are PyTrees of device arrays; bootstrapping keys are stored in NTT
  form with precomputed Shoup multiplication companions.

The public API mirrors the reference's ``include/mosfhet.h`` surface at
function granularity, re-spelled functionally (out = f(in) instead of
``f(out, in)``).
"""

import jax as _jax

# Exact wraparound uint64 torus arithmetic is the foundation of the whole
# library (reference: `Torus = uint64_t`, include/mosfhet.h:23-28); JAX's
# 64-bit mode must be on before any array is created.
_jax.config.update("jax_enable_x64", True)

from . import params
from . import torus
from . import rng
from . import ntt
from . import polynomial
from . import tlwe
from . import trlwe
from . import trgsw
from . import keyswitch
from . import bootstrap
from . import bootstrap_ga
from . import product
from . import seeded
from . import io
from . import parallel
from . import utils
from .params import TFHEParams, get_params, PARAM_REGISTRY

__version__ = "0.1.0"
