"""Randomness: counter-based (threefry) PRNG + gaussian torus noise.

The reference expands RDRAND seeds via AES-128-CTR/SHAKE-256 and applies
Box-Muller (`src/misc.c:30-97`, `src/rnd/aes_rng.c`).  A counter-based PRNG
is already TPU-native, so we use `jax.random` (threefry2x32) throughout;
`os.urandom` provides the root seed.  Gaussian noise is sampled directly
with `jax.random.normal` — the reference's Box-Muller is just a normal
sampler, and the statistical tests (`tests.c:70-120`) only constrain the
distribution, not the stream.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .torus import TORUS_BITS, TORUS_DTYPE


def new_seed() -> jax.Array:
    """Fresh root PRNG key from OS entropy (reference: `generate_rnd_seed`,
    `misc.c:32-50`)."""
    return jax.random.PRNGKey(int.from_bytes(os.urandom(8), "little"))


def uniform_torus(key, shape=()):
    """Uniform torus elements, reference `generate_random_bytes`
    filling Torus arrays (`misc.c:58-82`)."""
    if TORUS_BITS == 32:
        return jax.random.bits(key, shape, dtype=jnp.uint32)
    hi = jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.uint64)
    lo = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32)
    return (hi << jnp.uint64(32)) | lo.astype(jnp.uint64)


def normal_torus(key, sigma: float, shape=()):
    """Gaussian noise on the torus: round(N(0, sigma) * 2^TB) mod 2^TB.

    Mirrors `generate_torus_normal_random_array` (`misc.c:87-97`).  Sampled
    in float32 — quantization error (sigma * 2^-24) is far below sigma for
    every registry sigma.
    """
    e = jax.random.normal(key, shape, dtype=jnp.float32)
    scaled = e * jnp.float32(sigma * float(1 << TORUS_BITS))
    return scaled.astype(jnp.int64).astype(TORUS_DTYPE)


def bounded_key_array(key, shape, bound: int):
    """Secret-key coefficients uniform in [-(bound/2 - 1), bound/2], i.e.
    `s &= bound-1; s -= bound/2 - 1` on u64 randomness (`tlwe.c:70-78`,
    `trlwe.c:119-130`).  bound=2 gives binary {0,1}.  Returns int64."""
    r = jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.int64)
    return (r & (bound - 1)) - ((bound >> 1) - 1)


def binary_key_array(key, shape):
    return bounded_key_array(key, shape, 2)


def split(key, num: int = 2):
    return jax.random.split(key, num)
