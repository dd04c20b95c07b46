"""TLWE: LWE over the discretized torus, with a leading batch axis.

Mirrors `src/tlwe.c`: keygen, (noiseless) encryption, phase/decryption,
linear ops, and the digit-decomposed key switch.  Everything broadcasts over
arbitrary leading batch dims; ciphertexts are PyTrees of u64 arrays.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from . import rng as _rng
from .torus import TORUS_DTYPE, TORUS_BITS


@flax.struct.dataclass
class TLWE:
    """Ciphertext (a, b) with b = m + <s, a> + e (`tlwe.c:106-115`)."""
    a: jax.Array  # [..., n] u64
    b: jax.Array  # [...]    u64

    @property
    def n(self):
        return self.a.shape[-1]


@flax.struct.dataclass
class TLWEKey:
    s: jax.Array  # [n] int64, small entries
    sigma: float = flax.struct.field(pytree_node=False)

    @property
    def n(self):
        return self.s.shape[-1]


def new_bounded_key(key, n: int, bound: int, sigma: float) -> TLWEKey:
    """Uniform key in [-(bound/2-1), bound/2] (`tlwe.c:70-78`)."""
    return TLWEKey(s=_rng.bounded_key_array(key, (n,), bound), sigma=sigma)


def new_binary_key(key, n: int, sigma: float) -> TLWEKey:
    return new_bounded_key(key, n, 2, sigma)


def encrypt(m, skey: TLWEKey, key) -> TLWE:
    """b = m + sum_i s_i a_i + e (`tlwe_sample`, `tlwe.c:106-115`).
    ``m``: u64 torus array of any batch shape."""
    m = jnp.asarray(m, TORUS_DTYPE)
    ka, ke = jax.random.split(key)
    a = _rng.uniform_torus(ka, m.shape + (skey.n,))
    e = _rng.normal_torus(ke, skey.sigma, m.shape)
    b = m + jnp.sum(a * skey.s.astype(TORUS_DTYPE), axis=-1, dtype=TORUS_DTYPE) + e
    return TLWE(a=a, b=b)


def noiseless_trivial(m, n: int) -> TLWE:
    """(0, m) (`tlwe.c:19-29`)."""
    m = jnp.asarray(m, TORUS_DTYPE)
    return TLWE(a=jnp.zeros(m.shape + (n,), TORUS_DTYPE), b=m)


def phase(c: TLWE, skey: TLWEKey):
    """b - <s, a> (`tlwe_phase`, `tlwe.c:135-141`)."""
    return c.b - jnp.sum(c.a * skey.s.astype(TORUS_DTYPE), axis=-1, dtype=TORUS_DTYPE)


# --- linear algebra (`tlwe.c:143-191`) ------------------------------------

def add(c1: TLWE, c2: TLWE) -> TLWE:
    return TLWE(a=c1.a + c2.a, b=c1.b + c2.b)


def sub(c1: TLWE, c2: TLWE) -> TLWE:
    return TLWE(a=c1.a - c2.a, b=c1.b - c2.b)


def neg(c: TLWE) -> TLWE:
    return TLWE(a=TORUS_DTYPE(0) - c.a, b=TORUS_DTYPE(0) - c.b)


def scale(c: TLWE, w) -> TLWE:
    w = jnp.asarray(w, TORUS_DTYPE)
    return TLWE(a=c.a * w[..., None], b=c.b * w)


# --- key switching ---------------------------------------------------------

@flax.struct.dataclass
class TLWEKSKey:
    """Precomputed table: entry [i, j, v] encrypts
    s_in[i] * (v+1) * 2^(64-(j+1)*base_bit) under the output key
    (`tlwe_new_KS_key`, `tlwe.c:193-212`)."""
    a: jax.Array  # [n_in, t, base-1, n_out] u64
    b: jax.Array  # [n_in, t, base-1] u64
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)


def new_ks_key(key, out_key: TLWEKey, in_key: TLWEKey, t: int,
               base_bit: int) -> TLWEKSKey:
    base = 1 << base_bit
    n_in = in_key.n
    shifts = jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)],
        dtype=TORUS_DTYPE
    )
    vals = jnp.arange(1, base, dtype=TORUS_DTYPE)
    # m[i, j, v] = s_in[i] * (v+1) << shift_j
    m = (in_key.s.astype(TORUS_DTYPE)[:, None, None]
         * vals[None, None, :]) << shifts[None, :, None]
    c = encrypt(m, out_key, key)
    return TLWEKSKey(a=c.a, b=c.b, t=t, base_bit=base_bit)


@flax.struct.dataclass
class TLWEKSKeyM:
    """No-precomputation KS key: entry [i, j] encrypts
    s_in[i] * 2^(64-(j+1)*base_bit); the digit value multiplies at switch
    time (`tlwe_new_KS_key_no_precomp`, `tlwe.c:214-230`).  (base-1)x
    smaller than `TLWEKSKey` at the cost of a scalar multiply per entry."""
    a: jax.Array  # [n_in, t, n_out] u64
    b: jax.Array  # [n_in, t] u64
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)


def new_ks_key_no_precomp(key, out_key: TLWEKey, in_key: TLWEKey, t: int,
                          base_bit: int) -> TLWEKSKeyM:
    shifts = jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE
    )
    m = in_key.s.astype(TORUS_DTYPE)[:, None] << shifts[None, :]
    c = encrypt(m, out_key, key)
    return TLWEKSKeyM(a=c.a, b=c.b, t=t, base_bit=base_bit)


def keyswitch_no_precomp(c: TLWE, ksk: TLWEKSKeyM) -> TLWE:
    """out = (0, b) - sum_{i,j} aij * KS[i][j] with the extra rounding
    half-bit the reference adds in this variant
    (`tlwe_keyswitch_no_precomp`, `tlwe.c:305-320`)."""
    t, base_bit = ksk.t, ksk.base_bit
    prec_offset = TORUS_DTYPE(1 << (TORUS_BITS - (1 + base_bit * t)))
    offset = TORUS_DTYPE(1 << (TORUS_BITS - base_bit * t - 1))
    mask = TORUS_DTYPE((1 << base_bit) - 1)
    shifts = jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE
    )
    ai = c.a + prec_offset + offset                        # [..., n_in]
    dig = (ai[..., None] >> shifts) & mask                 # [..., n_in, t]
    sb = jnp.sum(dig * ksk.b, axis=(-2, -1), dtype=TORUS_DTYPE)
    # u64 "matmul" over (i, j) in chunks (XLA has no u64 dot)
    n_in = ksk.a.shape[0]
    chunk = min(n_in, 128)
    n_chunks = -(-n_in // chunk)
    pad = n_chunks * chunk - n_in
    dig_p = jnp.concatenate(
        [dig, jnp.zeros(dig.shape[:-2] + (pad, t), dig.dtype)], axis=-2
    ) if pad else dig
    ka = jnp.concatenate(
        [ksk.a, jnp.zeros((pad, t, ksk.a.shape[-1]), TORUS_DTYPE)], axis=0
    ) if pad else ksk.a
    dig_s = jnp.moveaxis(
        dig_p.reshape(dig.shape[:-2] + (n_chunks, chunk, t)), -3, 0)
    ka_s = ka.reshape(n_chunks, chunk, t, -1)

    def body(acc, xs):
        d, k_ = xs
        return acc + jnp.sum(d[..., None] * k_, axis=(-3, -2),
                             dtype=TORUS_DTYPE), None

    init = jnp.zeros(c.b.shape + (ksk.a.shape[-1],), TORUS_DTYPE)
    sa, _ = jax.lax.scan(body, init, (dig_s, ka_s))
    return TLWE(a=TORUS_DTYPE(0) - sa, b=c.b - sb)


@flax.struct.dataclass
class TLWEKSKeyPrepared:
    """MXU form of `TLWEKSKeyM`: key words split into 4-bit limbs so the
    digit contraction runs as exact int8 matmuls on the MXU.

    The no-precomp keyswitch is *linear* in the digits
    (out -= sum_ij d_ij * KS[i][j], `tlwe.c:305-320`), so it is a
    [batch, n_in*t] x [n_in*t, n_out+1] integer matmul; with 4-bit key
    limbs and digits < 2^7 every i32 accumulator stays exact
    (n_in*t * 127 * 15 < 2^31) and the mod-2^64 recombination is a few
    shifts.  This is the TPU-native fast path for key switching."""
    a_nib: jax.Array  # [16, n_in*t, n_out] int8
    b_nib: jax.Array  # [16, n_in*t] int8
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)


def prepare_ks_key_mxu(ksk: TLWEKSKeyM) -> TLWEKSKeyPrepared:
    assert ksk.base_bit <= 7, "digits must fit int8"
    K = ksk.a.shape[0] * ksk.a.shape[1]
    a = ksk.a.reshape(K, -1)
    b = ksk.b.reshape(K)
    nl = TORUS_BITS // 4
    shifts = jnp.arange(nl, dtype=TORUS_DTYPE) * TORUS_DTYPE(4)
    a_nib = ((a[None] >> shifts[:, None, None]) & TORUS_DTYPE(0xF)
             ).astype(jnp.int8)
    b_nib = ((b[None] >> shifts[:, None]) & TORUS_DTYPE(0xF)).astype(jnp.int8)
    return TLWEKSKeyPrepared(a_nib=a_nib, b_nib=b_nib, t=ksk.t,
                             base_bit=ksk.base_bit)


def keyswitch_mxu(c: TLWE, ksk: TLWEKSKeyPrepared) -> TLWE:
    """`keyswitch_no_precomp` on the MXU — bit-identical result."""
    t, base_bit = ksk.t, ksk.base_bit
    prec_offset = TORUS_DTYPE(1 << (TORUS_BITS - (1 + base_bit * t)))
    offset = TORUS_DTYPE(1 << (TORUS_BITS - base_bit * t - 1))
    mask = TORUS_DTYPE((1 << base_bit) - 1)
    shifts = jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE
    )
    ai = c.a + prec_offset + offset
    dig = ((ai[..., None] >> shifts) & mask).astype(jnp.int8)
    batch = c.b.shape
    D = dig.reshape(batch + (-1,))                        # [..., K]
    # exact int8 matmuls per 4-bit limb, recombined mod 2^64
    pa = jax.lax.dot_general(
        D, ksk.a_nib, (((D.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                 # [..., 16, n_out]
    pb = jax.lax.dot_general(
        D, ksk.b_nib, (((D.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                 # [..., 16]
    nl = TORUS_BITS // 4
    w = jnp.arange(nl, dtype=TORUS_DTYPE) * TORUS_DTYPE(4)
    sa = jnp.sum(pa.astype(TORUS_DTYPE) << w[:, None], axis=-2,
                 dtype=TORUS_DTYPE)
    sb = jnp.sum(pb.astype(TORUS_DTYPE) << w, axis=-1, dtype=TORUS_DTYPE)
    return TLWE(a=TORUS_DTYPE(0) - sa, b=c.b - sb)


def _ks_kernel_eligible(ksk: "TLWEKSKey") -> bool:
    import os
    if os.environ.get("MOSFHET_TPU_FORCE_JNP"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _keyswitch_pallas(c: TLWE, ksk: "TLWEKSKey", dig,
                      interpret: bool = False) -> TLWE:
    """Select-sum kernel route (`ops/pbs_kernel.tlwe_keyswitch_sum`):
    bit-identical to the gather path."""
    from .ops import pbs_kernel as _pk
    t = ksk.t
    n_in, n_out = ksk.a.shape[0], ksk.a.shape[-1]
    base_m1 = ksk.a.shape[2]
    batch = c.b.shape
    B = 1
    for d in batch:
        B *= d
    npad = -(-(n_out + 1) // 128) * 128
    ab = jnp.concatenate([ksk.a, ksk.b[..., None]], axis=-1)
    if npad > n_out + 1:
        ab = jnp.concatenate(
            [ab, jnp.zeros(ab.shape[:-1] + (npad - n_out - 1,), ab.dtype)],
            axis=-1)
    if TORUS_BITS == 32:
        planes = (jnp.asarray(ab, jnp.uint32),)
    else:
        planes = ((ab & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                  (ab >> jnp.uint64(32)).astype(jnp.uint32))
    # chunk the n_in streaming dim under the VMEM budget (Mosaic
    # double-buffers each streamed input block, so stay well under half)
    budget = (12 << 20) // max(1, t * base_m1 * npad * 4 * len(planes))
    chunk = 1
    for cnd in range(min(n_in, max(1, budget)), 0, -1):
        if n_in % cnd == 0:
            chunk = cnd
            break
    dg = dig.reshape(B, n_in, t).astype(jnp.int32)
    pad = (-B) % _pk.DEFAULT_BT
    if pad:
        dg = jnp.concatenate(
            [dg, jnp.zeros((pad, n_in, t), jnp.int32)], axis=0)
    sub = _pk.tlwe_keyswitch_sum(dg, planes, chunk_i=chunk,
                                 interpret=interpret)
    sub = (sub[:B] if pad else sub).reshape(batch + (npad,))
    return TLWE(a=TORUS_DTYPE(0) - sub[..., :n_out],
                b=c.b - sub[..., n_out])


def keyswitch(c: TLWE, ksk: TLWEKSKey, impl: str = "auto") -> TLWE:
    """Digit-decompose each a_i and subtract table entries
    (`tlwe_keyswitch`, `tlwe.c:289-303`).  The reference's `if aij != 0`
    branch becomes a dense select (an exact skip, so masking with zero is
    noise-free).  On TPU the select-sum runs as a fused kernel streaming
    the table through VMEM; elsewhere a scan over n_in chunks bounds the
    gather intermediate.  Both paths are bit-identical."""
    t, base_bit = ksk.t, ksk.base_bit
    n_in = ksk.a.shape[0]
    n_out = ksk.a.shape[-1]
    batch = c.b.shape

    prec_offset = TORUS_DTYPE(1 << (TORUS_BITS - (1 + base_bit * t)))
    mask = TORUS_DTYPE((1 << base_bit) - 1)
    shifts = jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE
    )
    ai = c.a + prec_offset                                  # [..., n_in]
    dig = (ai[..., None] >> shifts) & mask                  # [..., n_in, t]

    if impl == "auto":
        impl = "pallas" if _ks_kernel_eligible(ksk) else "jnp"
    if impl in ("pallas", "pallas_interpret"):
        return _keyswitch_pallas(c, ksk, dig,
                                 interpret=(impl == "pallas_interpret"))

    # bound the gathered temp [batch, chunk, t, n_out] to ~64 MB
    b_elems = 1
    for d in batch:
        b_elems *= d
    budget = (64 << 20) // max(1, b_elems * t * (n_out + 1) * 8)
    chunk = min(n_in, max(1, budget))
    n_chunks = -(-n_in // chunk)
    pad = n_chunks * chunk - n_in
    if pad:
        dig = jnp.concatenate(
            [dig, jnp.zeros(batch + (pad, t), dig.dtype)], axis=-2
        )
    base_m1 = ksk.a.shape[2]
    ks_a = jnp.concatenate(
        [ksk.a, jnp.zeros((pad, t, base_m1, n_out), TORUS_DTYPE)], axis=0
    ) if pad else ksk.a
    ks_b = jnp.concatenate(
        [ksk.b, jnp.zeros((pad, t, base_m1), TORUS_DTYPE)], axis=0
    ) if pad else ksk.b

    # [C, ..., chunk, t]
    dig_s = jnp.moveaxis(dig.reshape(batch + (n_chunks, chunk, t)), -3, 0)
    ks_a = ks_a.reshape(n_chunks, chunk * t * base_m1, n_out)
    ks_b = ks_b.reshape(n_chunks, chunk * t * base_m1)
    pos = (jnp.arange(chunk)[:, None] * t + jnp.arange(t)[None, :]) * base_m1

    def body(acc, xs):
        d, ka, kb = xs                                      # d: [..., chunk, t]
        nz = d != 0
        flat = pos + jnp.maximum(d.astype(jnp.int32) - 1, 0)
        ga = jnp.take(ka, flat, axis=0)                     # [..., chunk, t, n_out]
        gb = jnp.take(kb, flat, axis=0)                     # [..., chunk, t]
        za = jnp.where(nz[..., None], ga, TORUS_DTYPE(0))
        zb = jnp.where(nz, gb, TORUS_DTYPE(0))
        acc_a, acc_b = acc
        return (acc_a + jnp.sum(za, axis=(-3, -2), dtype=TORUS_DTYPE),
                acc_b + jnp.sum(zb, axis=(-2, -1), dtype=TORUS_DTYPE)), None

    init = (jnp.zeros(batch + (n_out,), TORUS_DTYPE),
            jnp.zeros(batch, TORUS_DTYPE))
    (sa, sb), _ = jax.lax.scan(body, init, (dig_s, ks_a, ks_b))
    return TLWE(a=TORUS_DTYPE(0) - sa, b=c.b - sb)
