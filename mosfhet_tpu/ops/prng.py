"""Threefry-2x32 as plain u32 vector ops — usable INSIDE Pallas kernels.

`jax.random` on TPU lowers threefry to a custom call a Pallas kernel
cannot reach, so kernels that must regenerate seeded masks (the streamed
seeded-KS applies; a future seeded-key GA stream kernel) need the block
cipher spelled out in jnp ops.  This module reimplements exactly the
mapping `jax.random.bits(key, (k, N), uint32)` uses:

    counts = iota(k*N); x0 = counts[:half], x1 = counts[half:]
    (y0, y1) = threefry2x32(key, (x0, x1)); out = concat(y0, y1)

and the repo's torus convention (`rng.uniform_torus`): the high u32 word
comes from `key`, the low word from `fold_in(key, 1)` — the folded key is
PRECOMPUTED host-side (`folded_key_data`) so in-kernel expansion is a
pure counter sweep.  Bit-exactness against jax.random is enforced by
tests/test_inkernel_prng.py; the seeded-sample format
(`seeded.SeededTRLWE`) decrypts only if this stays exact.

Reference analog: the AES-CTR keystream expansion the reference fuses
into its compressed-sample subtracts (`trlwe_compressed.c:118-154`,
`aes_rng.c:96-124`) — counter-mode expansion inside the consuming loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _rotl(x, r: int):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def threefry2x32(k1, k2, x0, x1):
    """One threefry-2x32 block over u32 arrays (20 rounds, the exact
    schedule of jax._src.prng.threefry2x32)."""
    ks = (k1, k2, k1 ^ k2 ^ _U32(0x1BD11BDA))
    rotations = ((13, 15, 26, 6), (17, 29, 16, 24))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in rotations[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + _U32(i + 1)
    return x0, x1


def random_u32_at(k1, k2, fidx, total: int):
    """Word `fidx` of jax.random.bits(key, (total,), uint32), vectorized
    over an i32/u32 array of flat indices.

    Matches jax's PARTITIONABLE threefry (`jax_threefry_partitionable`,
    the default): the 64-bit flat iota is split into (hi, lo) 32-bit
    counter words — hi is 0 below 2^32 elements — and the two cipher
    outputs are XORed.  tests/test_inkernel_prng.py pins bit-equality
    with jax.random; if the config default ever flips, that test fails
    loudly rather than keys silently not decrypting."""
    assert total < (1 << 32)
    f = fidx.astype(_U32)
    y0, y1 = threefry2x32(k1, k2, jnp.zeros_like(f), f)
    return y0 ^ y1


def mask_u64_words_at(key_hi, key_lo, fidx, total: int):
    """(hi, lo) u32 words of `rng.uniform_torus(key, shape)` at flat
    indices `fidx` (shape.size == total): hi from `key_hi` (the sample's
    stored key data), lo from `key_lo` (its fold_in(key, 1) companion,
    precomputed via `folded_key_data`)."""
    hi = random_u32_at(key_hi[0], key_hi[1], fidx, total)
    lo = random_u32_at(key_lo[0], key_lo[1], fidx, total)
    return hi, lo


def folded_key_data(seed_data):
    """fold_in(key, 1) key data for stored seeds [..., 2] u32 — host/XLA
    side, once at keygen; lets kernels skip the fold."""
    def one(sd):
        k = jax.random.wrap_key_data(sd)
        return jax.random.key_data(jax.random.fold_in(k, 1))
    f = one
    for _ in range(seed_data.ndim - 1):
        f = jax.vmap(f)
    return f(seed_data).astype(_U32)
