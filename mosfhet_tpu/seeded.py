"""Seeded (compressed) TRLWE samples.

The reference stores a 16-byte seed instead of the mask `a` and regenerates
`a` on the fly with xoroshiro128++/AES-CTR/SHAKE (`src/trlwe_compressed.c`,
`src/trlwe_compressed_vaes.c`), halving key-material memory — its packing
keyswitch keys are multi-GiB (`keyswitch.c:231-241`).

TPU-native version: the seed is a threefry PRNGKey; `a` is regenerated with
the same counter-based PRNG used everywhere else (already TPU-native — the
reference's VAES exponent-patch tricks are x86-isms with no TPU analog).
Layout-compatible import of the reference's compressed samples is not
possible (different PRNG), matching the reference's own behavior across its
A_PRNG build flags.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from . import rng as _rng
from . import trlwe as _trlwe
from .trlwe import TRLWE, TRLWEKey
from .torus import TORUS_DTYPE


@flax.struct.dataclass
class SeededTRLWE:
    """(seed, b): `a` is PRNG(seed) (`trlwe_new_compressed_sample`,
    `trlwe_compressed.c:37-53`)."""
    seed: jax.Array  # [..., 2] uint32 (raw PRNG key data)
    b: jax.Array     # [..., N] u64
    k: int = flax.struct.field(pytree_node=False)

    @property
    def N(self):
        return self.b.shape[-1]


def _expand_a(seed, k: int, N: int):
    """Regenerate the mask from the seed; batched over leading seed dims."""
    def one(sd):
        return _rng.uniform_torus(jax.random.wrap_key_data(sd), (k, N))
    batch = seed.shape[:-1]
    if batch:
        f = one
        for _ in range(len(batch)):
            f = jax.vmap(f)
        return f(seed)
    return one(seed)


def encrypt(m, key: TRLWEKey, rkey) -> SeededTRLWE:
    """Compressed encryption: derive a fresh seed, generate `a` from it,
    store only (seed, b)."""
    N, k = key.N, key.k
    m_arr = None if m is None else jnp.asarray(m, TORUS_DTYPE)
    batch = () if m_arr is None else m_arr.shape[:-1]
    ks, ke = jax.random.split(rkey)
    n_seeds = 1
    for d in batch:
        n_seeds *= d
    seed_data = jax.random.key_data(jax.random.split(ks, n_seeds))
    seed_data = seed_data.astype(jnp.uint32).reshape(batch + (2,))
    a = _expand_a(seed_data, k, N)
    e = _rng.normal_torus(ke, key.sigma, batch + (N,))
    b = _trlwe._key_mul_accum(a, key) + e
    if m_arr is not None:
        b = b + m_arr
    return SeededTRLWE(seed=seed_data, b=b, k=k)


def expand(c: SeededTRLWE) -> TRLWE:
    """Decompress to a full TRLWE (`trlwe_compressed.c:101-116`)."""
    return TRLWE(a=_expand_a(c.seed, c.k, c.N), b=c.b)


def subto(c: TRLWE, s: SeededTRLWE) -> TRLWE:
    """c - expand(s) in one pass (`trlwe_compressed_subto`,
    `trlwe_compressed.c:118-154`)."""
    return _trlwe.sub(c, expand(s))


# --- reference-compatible seeded samples -------------------------------------

@flax.struct.dataclass
class MosfhetSeededTRLWE:
    """A seeded TRLWE in the reference's wire format: 16-byte seed + b poly
    (`trlwe_save_compressed_sample`, `trlwe_compressed.c:66-69`); the mask is
    regenerated with xoroshiro128++ (`prng="xoroshiro"`, the reference's
    default) or SHAKE-128 (`prng="shake"`, USE_SHAKE builds)."""
    seed: jax.Array  # [..., 16] uint8
    b: jax.Array     # [..., N] u64
    k: int = flax.struct.field(pytree_node=False)
    prng: str = flax.struct.field(pytree_node=False, default="xoroshiro")

    @property
    def N(self):
        return self.b.shape[-1]


def expand_mosfhet(c: MosfhetSeededTRLWE) -> TRLWE:
    """Decompress a reference-format seeded sample bit-exactly (host-side
    via the native library; `trlwe_compressed_sample`,
    `trlwe_compressed.c:72-99`)."""
    import numpy as np
    from . import native as _native
    seed_np = np.asarray(c.seed, np.uint8)
    b_shape = c.b.shape
    N, k = b_shape[-1], c.k
    batch = seed_np.shape[:-1]
    seeds = seed_np.reshape(-1, 16)
    masks = []
    for s in seeds:
        sb = s.tobytes()
        if c.prng == "xoroshiro":
            masks.append(_native.xoroshiro_expand(sb, k, N))
        else:
            masks.append(_native.shake_mask_expand(sb, k, N))
    a = np.stack(masks).reshape(batch + (k, N))
    return TRLWE(a=jnp.asarray(a), b=c.b)
