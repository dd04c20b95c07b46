"""Key switching: the full family from `src/keyswitch.c`.

- TRLWE->TRLWE KS (digit decompose + NTT mul-acc)        (`keyswitch.c:12-37,162-193`)
- relinearization key (s^2)                              (`keyswitch.c:3-10`)
- private KS pair TRLWE(M)->TRLWE(m*(-s))                (`keyswitch.c:39-63`)
- RLWE private KS with multiplicand polynomial v         (`keyswitch.c:575-608`)
- full packing n TLWE -> TRLWE (TLWE key as k=n,N=1)     (`keyswitch.c:99-107,195-227`)
- LUT packing KS (replicating each message into slots)   (`keyswitch.c:244-270,343-364`)
- packing1 KS TLWE -> TRLWE(m*X^0)                       (`keyswitch.c:368-390,458-475`)
- CDKS21 packing via log N automorphism-trace keys       (`keyswitch.c:477-498,526-546`)
- automorphism keysets + EvalAuto                        (`keyswitch.c:500-524`, `trlwe.c:775-781`)
- private-SK KS + gadget->RGSW conversion                (`keyswitch.c:548-572,611-656`)

Gather-style switches (the reference's `if aij != 0` table subtractions)
become dense masked gathers; digit-decomposed switches become the same fused
NTT mul-acc kernel as the external product.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

from . import ntt as _ntt
from . import polynomial as _poly
from . import trlwe as _trlwe
from .tlwe import TLWE, TLWEKey
from .trlwe import TRLWE, TRLWEKey, from_stacked
from .torus import TORUS_DTYPE, TORUS_BITS, gadget_decompose


# =========================================================================
# TRLWE -> TRLWE keyswitch (digit decomposition flavor)
# =========================================================================

@flax.struct.dataclass
class TRLWEKSKey:
    """v/vs: [k_in(+1), t, k_out+1, P, N] NTT-form encryptions of
    s_in[i] * 2^(64-(j+1)*base_bit) (`trlwe_new_KS_key`)."""
    v: jax.Array
    vs: jax.Array
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)

    @property
    def k_in(self):
        return self.v.shape[0]

    def plan(self):
        return _ntt.get_plan(self.v.shape[-1], self.primes)


def _ks_plan(N: int, base_bit: int, t: int, k_in: int):
    bound = _ntt.conv_bound(N, 1 << (base_bit - 1), k_in * t)
    return _ntt.get_plan(N, _ntt.primes_for_bound(bound, N))


def _encrypt_batch_to_dft(ms, out_key: TRLWEKey, rkey, plan):
    """Encrypt a [..., N] batch of messages, return stacked NTT form with
    Shoup companions: [..., k+1, P, N] x2."""
    c = _trlwe.encrypt(ms, out_key, rkey)
    v = _ntt.to_ntt_u64(c.stacked(), plan)
    return v, _ntt.make_shoup(v, plan.p[:, None])


def new_trlwe_ks_key(rkey, out_key: TRLWEKey, in_key: TRLWEKey, t: int,
                     base_bit: int) -> TRLWEKSKey:
    """(`trlwe_new_KS_key`, `keyswitch.c:12-37`)."""
    N = out_key.N
    plan = _ks_plan(N, base_bit, t, in_key.k * t)
    shifts = jnp.array([TORUS_BITS - (j + 1) * base_bit for j in range(t)],
                       dtype=TORUS_DTYPE)
    # ms[i, j, :] = s_in[i] * 2^shift_j
    ms = in_key.s.astype(TORUS_DTYPE)[:, None, :] * \
        (TORUS_DTYPE(1) << shifts)[None, :, None]
    v, vs = _encrypt_batch_to_dft(ms, out_key, rkey, plan)
    return TRLWEKSKey(v=v, vs=vs, t=t, base_bit=base_bit, primes=plan.primes)


@flax.struct.dataclass
class SeededTRLWEKSKey:
    """Seeded (compressed) multiply-style TRLWE-KS key: per entry only
    the 8-byte threefry seed and the b polynomial's NTT spectrum — the
    dense a-part spectra (k_out/(k_out+1) of the key) are regenerated
    inside the apply jit.

    TPU-native answer to the reference's DFT-domain compressed samples
    (`trlwe_compressed_vaes.c:88-202`), which DEFINE the mask in the DFT
    domain (AES keystream exponent-patched into doubles) so the apply
    never transforms it.  That trick is mathematically unavailable to
    exact CRT-NTT arithmetic: a spectrum-sampled mask has coefficients
    uniform mod prod(p) ~ 2^90, which breaks both the wraparound u64
    torus semantics and the CRT reconstruction bound (the convolution
    integer must stay < prod(p)/2, which needs |a| <= 2^63).  The exact
    equivalent keeps the mask DEFINED in the coefficient domain (u64,
    unbiased) but stores only its seed; expansion -> residues -> forward
    NTT run fused in the apply, so the expanded key exists only as a
    transient of one jit, never in storage or between steps."""
    seeds: jax.Array   # [k_in, t, 2] u32 threefry key data
    b_v: jax.Array     # [k_in, t, P, N] u64 b spectra
    b_vs: jax.Array
    k_out: int = flax.struct.field(pytree_node=False)
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)

    @property
    def k_in(self):
        return self.seeds.shape[0]

    def plan(self):
        return _ntt.get_plan(self.b_v.shape[-1], self.primes)


def new_trlwe_ks_key_seeded(rkey, out_key: TRLWEKey, in_key: TRLWEKey,
                            t: int, base_bit: int) -> SeededTRLWEKSKey:
    """Seeded `trlwe_new_KS_key`: same encryptions as the dense keygen,
    masks drawn from per-entry seeds (`trlwe_new_compressed_sample`,
    `trlwe_compressed.c:37-53`, lifted to the KS-key table)."""
    from . import seeded as _seeded
    N, k_in = out_key.N, in_key.k
    plan = _ks_plan(N, base_bit, t, k_in * t)
    shifts = jnp.array([TORUS_BITS - (j + 1) * base_bit for j in range(t)],
                       dtype=TORUS_DTYPE)
    ms = in_key.s.astype(TORUS_DTYPE)[:, None, :] * \
        (TORUS_DTYPE(1) << shifts)[None, :, None]        # [k_in, t, N]
    sc = _seeded.encrypt(ms, out_key, rkey)              # seeds + b
    b_v = _ntt.to_ntt_u64(sc.b, plan)                    # [k_in, t, P, N]
    return SeededTRLWEKSKey(
        seeds=sc.seed, b_v=b_v, b_vs=_ntt.make_shoup(b_v, plan.p[:, None]),
        k_out=out_key.k, t=t, base_bit=base_bit, primes=plan.primes)


def _seeded_ks_mul_acc(digits, sk: SeededTRLWEKSKey):
    """sum over rows of NTT(digits) * entry, expanding each entry's mask
    spectra from its seed inside the same trace (Barrett mul for the
    regenerated a rows, Shoup for the stored b rows)."""
    from . import seeded as _seeded
    plan = sk.plan()
    R = sk.k_in * sk.t
    spec = _ntt.to_ntt_small(digits, plan)               # [..., R, P, N]
    a = _seeded._expand_a(sk.seeds.reshape(R, 2), sk.k_out,
                          sk.b_v.shape[-1])              # [R, k_out, N]
    av = _ntt.to_ntt_u64(a, plan)                        # [R, k_out, P, N]
    acc_a = _ntt.pointwise_mul_acc_generic(
        spec[..., :, None, :, :], av, plan, axis=-4)     # [..., k_out, P, N]
    bv = sk.b_v.reshape(R, 1, plan.P, sk.b_v.shape[-1])
    bvs = sk.b_vs.reshape(bv.shape)
    acc_b = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], bv, bvs, plan, axis=-4)
    return jnp.concatenate([acc_a, acc_b], axis=-3)


def _decompose_digits(x, base_bit: int, t: int):
    """[..., C, N] -> [..., C*t, N] rounded digits (decompose_i offsets)."""
    d = gadget_decompose(x, base_bit, t)      # [..., C, t, N]
    return d.reshape(d.shape[:-3] + (d.shape[-3] * t, d.shape[-1]))


def _mul_acc_ks(digits, key_v, key_vs, plan):
    """sum over rows of NTT(digits) * key — shared fused kernel."""
    spec = _ntt.to_ntt_small(digits, plan)
    return _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], key_v, key_vs, plan, axis=-4)


def trlwe_keyswitch(c: TRLWE, ksk) -> TRLWE:
    """(`trlwe_keyswitch`, `keyswitch.c:162-193`):
    out = (0, b) - sum_{i,j} dec_j(a_i) (*) KS[i][j].
    Accepts a dense `TRLWEKSKey` or a `SeededTRLWEKSKey` (mask spectra
    regenerated from seeds inside the apply)."""
    plan = ksk.plan()
    digits = _decompose_digits(c.a, ksk.base_bit, ksk.t)
    if isinstance(ksk, SeededTRLWEKSKey):
        acc = _seeded_ks_mul_acc(digits, ksk)
    else:
        kv = ksk.v.reshape((-1,) + ksk.v.shape[2:])
        kvs = ksk.vs.reshape((-1,) + ksk.vs.shape[2:])
        acc = _mul_acc_ks(digits, kv, kvs, plan)
    as_ = from_stacked(_ntt.from_ntt_u64(acc, plan))
    out = _trlwe.noiseless_trivial(c.b, as_.k, as_.N)
    return _trlwe.sub(out, as_)


def new_rl_key(rkey, key: TRLWEKey, t: int, base_bit: int) -> TRLWEKSKey:
    """Relinearization key: KS key for s^2 (`trlwe_new_RL_key`,
    `keyswitch.c:3-10`).  k must be 1."""
    assert key.k == 1
    s2 = _poly.ntt_mul_small_small(key.s[0], key.s[0],
                                   key.s_bound, key.s_bound)
    key2 = TRLWEKey(s=s2[None], sigma=key.sigma,
                    s_bound=key.s_bound * key.s_bound * key.N)
    return new_trlwe_ks_key(rkey, key, key2, t, base_bit)


def new_priv_ks_key_pair(rkey, out_key: TRLWEKey, in_key: TRLWEKey, t: int,
                         base_bit: int):
    """[KS for -s_out*s_in, KS for -s_out] (`trlwe_new_priv_KS_key`,
    `keyswitch.c:39-63`)."""
    assert out_key.k == 1
    k1, k2 = jax.random.split(rkey)
    prod = _poly.ntt_mul_small_small(-out_key.s[0], in_key.s[0],
                                     out_key.s_bound, in_key.s_bound)
    tmp1 = TRLWEKey(s=prod[None], sigma=out_key.sigma,
                    s_bound=out_key.s_bound * in_key.s_bound * out_key.N)
    tmp2 = TRLWEKey(s=-out_key.s, sigma=out_key.sigma,
                    s_bound=out_key.s_bound)
    return (new_trlwe_ks_key(k1, out_key, tmp1, t, base_bit),
            new_trlwe_ks_key(k2, out_key, tmp2, t, base_bit))


def priv_keyswitch_2(c: TRLWE, ks_pair) -> TRLWE:
    """(`trlwe_priv_keyswitch_2`, `keyswitch.c:52-63`)."""
    assert c.k == 1
    neg_b = TRLWE(a=(TORUS_DTYPE(0) - c.b)[..., None, :],
                  b=jnp.zeros_like(c.b))
    tmp = trlwe_keyswitch(neg_b, ks_pair[1])
    ca = TRLWE(a=c.a, b=jnp.zeros_like(c.b))
    out = trlwe_keyswitch(ca, ks_pair[0])
    return _trlwe.add(out, tmp)


def new_rlwe_priv_ks_key(rkey, out_key: TRLWEKey, in_key: TRLWEKey, v,
                         t: int, base_bit: int) -> TRLWEKSKey:
    """KS with multiplicand polynomial v: rows for each a_i carry s_i*v,
    plus a row for b carrying v itself (`trlwe_new_RLWE_priv_KS_key`,
    `keyswitch.c:575-608`).  v: [N] u64."""
    N = out_key.N
    plan = _ks_plan(N, base_bit, t, (in_key.k + 1) * t)
    v = jnp.asarray(v, TORUS_DTYPE)
    shifts = (TORUS_DTYPE(1) << jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE))
    sv = jnp.stack([
        _poly.ntt_mul_small(in_key.s[i], v, in_key.plan())
        for i in range(in_key.k)
    ] + [v])                                        # [k_in+1, N]
    ms = sv[:, None, :] * shifts[None, :, None]     # [k_in+1, t, N]
    vv, vvs = _encrypt_batch_to_dft(ms, out_key, rkey, plan)
    return TRLWEKSKey(v=vv, vs=vvs, t=t, base_bit=base_bit,
                      primes=plan.primes)


def rlwe_priv_keyswitch(c: TRLWE, ksk: TRLWEKSKey) -> TRLWE:
    """(`trlwe_RLWE_priv_keyswitch`, `keyswitch.c:65-97`):
    out = sum dec(b) (*) KS[k] - sum_i dec(a_i) (*) KS[i]."""
    plan = ksk.plan()
    k_in = c.k
    dig_a = _decompose_digits(c.a, ksk.base_bit, ksk.t)
    kv_a = ksk.v[:k_in].reshape((-1,) + ksk.v.shape[2:])
    kvs_a = ksk.vs[:k_in].reshape((-1,) + ksk.vs.shape[2:])
    as_ = _mul_acc_ks(dig_a, kv_a, kvs_a, plan)
    dig_b = _decompose_digits(c.b[..., None, :], ksk.base_bit, ksk.t)
    bs = _mul_acc_ks(dig_b, ksk.v[k_in], ksk.vs[k_in], plan)
    out = _ntt.sub(bs, as_, plan)
    return from_stacked(_ntt.from_ntt_u64(out, plan))


# =========================================================================
# full packing: n TLWEs -> one TRLWE (`keyswitch.c:99-107,195-227`)
# =========================================================================

@flax.struct.dataclass
class FullPackingKSKey:
    """v/vs: [n, t, k_out+1, P, N]: TRLWE(s_i * 2^shift_j * X^0)."""
    v: jax.Array
    vs: jax.Array
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)

    def plan(self):
        return _ntt.get_plan(self.v.shape[-1], self.primes)


def new_full_packing_ks_key(rkey, out_key: TRLWEKey, in_key: TLWEKey, t: int,
                            base_bit: int) -> FullPackingKSKey:
    N = out_key.N
    plan = _ks_plan(N, base_bit, t, in_key.n * t)  # wide: sum over n*t rows
    shifts = (TORUS_DTYPE(1) << jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE))
    const = in_key.s.astype(TORUS_DTYPE)[:, None] * shifts[None, :]  # [n, t]
    ms = jnp.zeros((in_key.n, t, N), TORUS_DTYPE).at[:, :, 0].set(const)
    v, vs = _encrypt_batch_to_dft(ms, out_key, rkey, plan)
    return FullPackingKSKey(v=v, vs=vs, t=t, base_bit=base_bit,
                            primes=plan.primes)


def full_packing_keyswitch(cs: TLWE, size: int,
                           ksk: FullPackingKSKey) -> TRLWE:
    """Pack `size` TLWEs (leading batch axis of cs) into slot coefficients of
    one TRLWE (`trlwe_full_packing_keyswitch`, `keyswitch.c:195-227`)."""
    plan = ksk.plan()
    N = ksk.v.shape[-1]
    n = cs.a.shape[-1]
    # a_poly[i, coeff j] = cs.a[j, i]  (ciphertext index becomes coefficient)
    a_i = jnp.swapaxes(cs.a, -1, -2)                   # [..., n, size]
    pad = jnp.zeros(a_i.shape[:-1] + (N - size,), TORUS_DTYPE)
    a_i = jnp.concatenate([a_i, pad], axis=-1)         # [..., n, N]
    digits = _decompose_digits(a_i, ksk.base_bit, ksk.t)
    kv = ksk.v.reshape((-1,) + ksk.v.shape[2:])
    kvs = ksk.vs.reshape((-1,) + ksk.vs.shape[2:])
    acc = _mul_acc_ks(digits, kv, kvs, plan)
    out = from_stacked(_ntt.from_ntt_u64(acc, plan))
    out = _trlwe.neg(out)
    b = out.b.at[..., :size].add(cs.b)
    return TRLWE(a=out.a, b=b)


# =========================================================================
# gather-style packing keyswitches (`keyswitch.c:244-475,611-656`)
# =========================================================================

@flax.struct.dataclass
class GenericKSKey:
    """Table of TRLWEs, stacked [n(+include_b), t, base-1, k+1, N]
    (`Generic_KS_Key`, `mosfhet.h:100-104`)."""
    table: jax.Array
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    include_b: bool = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class LUTPackingKSKey:
    """Table [n, torus_base, t, base-1, k+1, N] (`LUT_Packing_KS_Key`)."""
    table: jax.Array
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    torus_base: int = flax.struct.field(pytree_node=False)


def _zero_trlwe_table(rkey, out_key: TRLWEKey, shape):
    """Encryptions of zero for every table slot, stacked [..., k+1, N].

    Encrypted in fixed-size chunks via `lax.map` — packing-KS tables have
    tens of thousands of slots and a single batched encryption would
    materialize tens of GB of NTT intermediates."""
    total = 1
    for d in shape:
        total *= d
    chunk = 2048
    if total <= chunk:
        ms = jnp.zeros(shape + (out_key.N,), TORUS_DTYPE)
        return _trlwe.encrypt(ms, out_key, rkey).stacked()
    n_chunks = -(-total // chunk)
    keys = jax.random.split(rkey, n_chunks)
    zeros = jnp.zeros((chunk, out_key.N), TORUS_DTYPE)

    def one(rk):
        return _trlwe.encrypt(zeros, out_key, rk).stacked()

    parts = jax.lax.map(one, keys)          # [n_chunks, chunk, k+1, N]
    flat = parts.reshape(n_chunks * chunk, out_key.k + 1, out_key.N)
    return flat[:total].reshape(shape + (out_key.k + 1, out_key.N))


def _dec_key_values(in_s, t: int, base_bit: int):
    """dec[i, j, v] = s_i * (v+1) * 2^(64-(j+1)*base_bit)."""
    base = 1 << base_bit
    shifts = (TORUS_DTYPE(1) << jnp.array(
        [TORUS_BITS - (j + 1) * base_bit for j in range(t)], dtype=TORUS_DTYPE))
    vals = jnp.arange(1, base, dtype=TORUS_DTYPE)
    return (in_s.astype(TORUS_DTYPE)[:, None, None] * vals[None, None, :]
            * shifts[None, :, None])


def new_packing1_ks_key(rkey, out_key: TRLWEKey, in_key: TLWEKey, t: int,
                        base_bit: int) -> GenericKSKey:
    """TLWE(m) -> TRLWE(m*X^0) key (`trlwe_new_packing1_KS_key`,
    `keyswitch.c:368-390`)."""
    tab = _zero_trlwe_table(rkey, out_key,
                            (in_key.n, t, (1 << base_bit) - 1))
    dec = _dec_key_values(in_key.s, t, base_bit)
    tab = tab.at[..., -1, 0].add(dec)
    return GenericKSKey(table=tab, t=t, base_bit=base_bit, include_b=False)


def new_priv_sk_ks_key(rkey, out_key: TRLWEKey, in_key: TLWEKey, t: int,
                       base_bit: int) -> GenericKSKey:
    """TLWE(M) -> TRLWE(m * -s) in n^2 (`trlwe_new_priv_SK_KS_key_N2`,
    `keyswitch.c:611-637`)."""
    assert out_key.k == 1
    n = in_key.n
    s_ext = jnp.concatenate(
        [in_key.s, jnp.array([-1], jnp.int64)])          # b row: s = -1
    tab = _zero_trlwe_table(rkey, out_key,
                            (n + 1, t, (1 << base_bit) - 1))
    dec = _dec_key_values(s_ext, t, base_bit)            # [n+1, t, base-1]
    minus_s = (TORUS_DTYPE(0) - out_key.s[0].astype(TORUS_DTYPE))  # [N]
    tab = tab.at[..., -1, :].add(dec[..., None] * minus_s)
    return GenericKSKey(table=tab, t=t, base_bit=base_bit, include_b=True)


@flax.struct.dataclass
class SeededGenericKSKey:
    """Compressed Generic_KS_Key (packing1 / priv-SK flavors): masks as
    threefry seeds, key material on the stored b polynomials — halves the
    7.5-9.4 GiB tables that otherwise exceed one chip's HBM at
    TFHEPP_L2/SET_3 native parameters (the reference's
    USE_COMPRESSED_TRLWE trick, `keyswitch.c:231-241`)."""
    seeds: jax.Array   # [n(+b), t, base-1, 2] u32 key data
    b: jax.Array       # [n(+b), t, base-1, N]
    k: int = flax.struct.field(pytree_node=False)
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    include_b: bool = flax.struct.field(pytree_node=False)


def _seeded_zero_table(rkey, out_key: TRLWEKey, total: int, add_fn=None):
    """Seeded zero-encryptions for `total` table slots (chunked).

    `add_fn(flat_idx [chunk] i32) -> [chunk, N]` adds the key material to
    each chunk's b polynomials INSIDE the chunked map, so the keygen
    transient never exceeds the seeded key itself (the dense-table keygens
    have a ~2x transient that OOMs at TFHEPP_L2/SET_3 native sizes).  The
    chunk is chosen as a divisor of `total` when possible so the final
    table needs no trimming copy."""
    from . import seeded as _seeded
    import os
    N = out_key.N
    # MOSFHET_KEYGEN_CHUNK caps the per-chunk keygen transient (mask NTT
    # buffers scale with it) — the SET_3 priv-SK table keygen OOMs next to
    # a resident packing1 table at the default 2048 (probe_cb_mem.py)
    chunk = min(int(os.environ.get("MOSFHET_KEYGEN_CHUNK", "2048")), total)
    cap = chunk
    for c in range(chunk, 0, -1):
        if total % c == 0:
            chunk = c
            break
        if cap - c > 1792:        # no usable divisor: pad + trim instead
            break
    n_chunks = -(-total // chunk)
    keys = jax.random.split(rkey, n_chunks)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    zeros = jnp.zeros((chunk, N), TORUS_DTYPE)

    def one(args):
        rk, start = args
        c = _seeded.encrypt(zeros, out_key, rk)
        bb = c.b
        if add_fn is not None:
            idx = jnp.minimum(start + jnp.arange(chunk, dtype=jnp.int32),
                              total - 1)
            bb = bb + add_fn(idx)
        return c.seed, bb

    seeds, bs = jax.lax.map(one, (keys, starts))
    return (seeds.reshape(n_chunks * chunk, 2)[:total],
            bs.reshape(n_chunks * chunk, N)[:total])


def _seeded_zero_table_hoststaged(rkey, out_key: TRLWEKey, total: int,
                                  add_fn=None, parts: int = 8):
    """Staged `_seeded_zero_table`: generate the table in `parts`
    separate jitted programs, accumulating each span into a DONATED
    device buffer via dynamic_update_slice.

    Why: the single-program keygen's internal buffer demand is ~2x its
    output (measured, `benchmarks/probe_coresident.py`) — at SET_3 that
    is ~9 GiB, which cannot fit NEXT TO an already-resident 4.4 GiB
    sister table (the circuit-bootstrap key pair).  Staging caps the
    device peak at ~table + 3x table/parts (the donated accumulator
    updates in place; a host round trip was measured worse — a single
    4.4 GiB transfer through the tunnel itself RESOURCE_EXHAUSTs).
    Must be called OUTSIDE jit."""
    N = out_key.N
    span = max(1, total // parts)
    bt_dtype = jnp.uint32 if TORUS_BITS == 32 else jnp.uint64
    seeds_buf = jnp.zeros((total, 2), jnp.uint32)
    b_buf = jnp.zeros((total, N), bt_dtype)

    def upd(buf, part, start):
        return jax.lax.dynamic_update_slice(
            buf, part, (start, jnp.zeros((), jnp.int32)))

    upd_b = jax.jit(upd, donate_argnums=0)
    upd_s = jax.jit(upd, donate_argnums=0)

    start0 = 0
    pi = 0
    while start0 < total:
        cnt = span if start0 + 2 * span <= total else total - start0
        part_fn = None
        if add_fn is not None:
            part_fn = (lambda idx, s0=start0: add_fn(idx + s0))

        def gen_p(rk, cnt=cnt, part_fn=part_fn):
            return _seeded_zero_table(rk, out_key, cnt, part_fn)

        s, b = jax.jit(gen_p)(jax.random.fold_in(rkey, pi))
        seeds_buf = upd_s(seeds_buf, s, jnp.int32(start0))
        b_buf = upd_b(b_buf, b, jnp.int32(start0))
        del s, b
        start0 += cnt
        pi += 1
    return seeds_buf, b_buf


def _table_gen(total: int):
    """Select the table generator: MOSFHET_KEYGEN_HOST=1 picks the
    host-staged form (callable only outside jit)."""
    import os
    if os.environ.get("MOSFHET_KEYGEN_HOST") == "1":
        return _seeded_zero_table_hoststaged
    return _seeded_zero_table


def new_packing1_ks_key_seeded(rkey, out_key: TRLWEKey, in_key: TLWEKey,
                               t: int, base_bit: int) -> SeededGenericKSKey:
    """Seeded `trlwe_new_packing1_KS_key` (`keyswitch.c:368-390`)."""
    n = in_key.n
    base_m1 = (1 << base_bit) - 1
    dec_flat = _dec_key_values(in_key.s, t, base_bit).reshape(-1)

    def add_fn(idx):      # key value lands on coefficient 0 only
        out = jnp.zeros((idx.shape[0], out_key.N), TORUS_DTYPE)
        return out.at[:, 0].set(dec_flat[idx])

    seeds, b = _table_gen(n * t * base_m1)(rkey, out_key,
                                           n * t * base_m1, add_fn)
    shape = (n, t, base_m1)
    return SeededGenericKSKey(seeds=seeds.reshape(shape + (2,)),
                              b=b.reshape(shape + (out_key.N,)),
                              k=out_key.k, t=t,
                              base_bit=base_bit, include_b=False)


def new_priv_sk_ks_key_seeded(rkey, out_key: TRLWEKey, in_key: TLWEKey,
                              t: int, base_bit: int) -> SeededGenericKSKey:
    """Seeded `trlwe_new_priv_SK_KS_key_N2` (`keyswitch.c:611-637`)."""
    assert out_key.k == 1
    n = in_key.n
    base_m1 = (1 << base_bit) - 1
    s_ext = jnp.concatenate([in_key.s, jnp.array([-1], jnp.int64)])
    dec_flat = _dec_key_values(s_ext, t, base_bit).reshape(-1)
    minus_s = (TORUS_DTYPE(0) - out_key.s[0].astype(TORUS_DTYPE))

    def add_fn(idx):
        return dec_flat[idx][:, None] * minus_s[None, :]

    seeds, b = _table_gen((n + 1) * t * base_m1)(
        rkey, out_key, (n + 1) * t * base_m1, add_fn)
    shape = (n + 1, t, base_m1)
    return SeededGenericKSKey(seeds=seeds.reshape(shape + (2,)),
                              b=b.reshape(shape + (out_key.N,)),
                              k=out_key.k, t=t,
                              base_bit=base_bit, include_b=True)


def expand_generic_ks_key(sk: SeededGenericKSKey) -> GenericKSKey:
    """Regenerate the masks and assemble the dense table (chunked)."""
    from . import seeded as _seeded
    N = sk.b.shape[-1]
    shape = sk.b.shape[:-1]
    total = 1
    for d in shape:
        total *= d
    seeds = sk.seeds.reshape(total, 2)
    bs = sk.b.reshape(total, N)
    chunk = min(2048, total)
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    if pad:
        seeds = jnp.concatenate([seeds, seeds[:pad]], axis=0)
        bs = jnp.concatenate([bs, bs[:pad]], axis=0)

    def one(args):
        sd, b = args
        a = _seeded._expand_a(sd, sk.k, N)
        return jnp.concatenate([a, b[:, None, :]], axis=1)

    tab = jax.lax.map(one, (seeds.reshape(n_chunks, chunk, 2),
                            bs.reshape(n_chunks, chunk, N)))
    tab = tab.reshape(n_chunks * chunk, sk.k + 1, N)[:total]
    return GenericKSKey(table=tab.reshape(shape + (sk.k + 1, N)),
                        t=sk.t, base_bit=sk.base_bit,
                        include_b=sk.include_b)


@flax.struct.dataclass
class SeededLUTPackingKSKey:
    """Compressed LUT-packing key: the uniform mask `a` of every table
    TRLWE is stored as a threefry seed and regenerated on expansion —
    the reference's USE_COMPRESSED_TRLWE build does the same with
    xoroshiro inside its KS keys (`keyswitch.c:231-241`), halving the
    multi-GB table (k/(k+1) of the ciphertext words)."""
    seeds: jax.Array   # [n, torus_base, t, base-1, 2] u32 key data
    b: jax.Array       # [n, torus_base, t, base-1, N]
    k: int = flax.struct.field(pytree_node=False)
    t: int = flax.struct.field(pytree_node=False)
    base_bit: int = flax.struct.field(pytree_node=False)
    torus_base: int = flax.struct.field(pytree_node=False)


def new_lut_packing_ks_key_seeded(rkey, out_key: TRLWEKey, in_key: TLWEKey,
                                  t: int, base_bit: int,
                                  torus_base: int) -> SeededLUTPackingKSKey:
    """Seeded variant of `new_lut_packing_ks_key`; key material (the
    slot-replicated decomposed key values) is added inside the chunked
    keygen map so the transient stays at the seeded key's own size."""
    N, k, n = out_key.N, out_key.k, in_key.n
    base_m1 = (1 << base_bit) - 1
    total = n * torus_base * t * base_m1
    dec_flat = _dec_key_values(in_key.s, t, base_bit).reshape(-1)  # (i,j,v)
    slot = N // torus_base
    e_of_coeff = jnp.arange(N) // slot
    mask = (e_of_coeff[None, :] ==
            jnp.arange(torus_base)[:, None]).astype(TORUS_DTYPE)   # [tb, N]

    def add_fn(idx):      # table layout (i, e, j, v) row-major
        i = idx // (torus_base * t * base_m1)
        e = (idx // (t * base_m1)) % torus_base
        jv = idx % (t * base_m1)
        return dec_flat[(i * t * base_m1 + jv)][:, None] * mask[e]

    seeds, bs = _seeded_zero_table(rkey, out_key, total, add_fn)
    shape = (n, torus_base, t, base_m1)
    return SeededLUTPackingKSKey(seeds=seeds.reshape(shape + (2,)),
                                 b=bs.reshape(shape + (N,)), k=k, t=t,
                                 base_bit=base_bit, torus_base=torus_base)


def expand_lut_packing_ks_key(sk: SeededLUTPackingKSKey) -> LUTPackingKSKey:
    """Regenerate the masks and assemble the dense table (chunked)."""
    from . import seeded as _seeded
    N = sk.b.shape[-1]
    shape = sk.b.shape[:-1]
    total = 1
    for d in shape:
        total *= d
    seeds = sk.seeds.reshape(total, 2)
    bs = sk.b.reshape(total, N)
    chunk = 2048
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    if pad:
        seeds = jnp.concatenate([seeds, seeds[:pad]], axis=0)
        bs = jnp.concatenate([bs, bs[:pad]], axis=0)

    def one(args):
        sd, b = args
        a = _seeded._expand_a(sd, sk.k, N)
        return jnp.concatenate([a, b[:, None, :]], axis=1)  # [chunk, k+1, N]

    tab = jax.lax.map(one, (seeds.reshape(n_chunks, chunk, 2),
                            bs.reshape(n_chunks, chunk, N)))
    tab = tab.reshape(n_chunks * chunk, sk.k + 1, N)[:total]
    return LUTPackingKSKey(table=tab.reshape(shape + (sk.k + 1, N)),
                           t=sk.t, base_bit=sk.base_bit,
                           torus_base=sk.torus_base)


def new_lut_packing_ks_key(rkey, out_key: TRLWEKey, in_key: TLWEKey, t: int,
                           base_bit: int, torus_base: int) -> LUTPackingKSKey:
    """(`trlwe_new_packing_KS_key`, `keyswitch.c:244-270`): entry [i,e,j,v]
    replicates the decomposed key value into slot e."""
    N = out_key.N
    n = in_key.n
    tab = _zero_trlwe_table(
        rkey, out_key, (n, torus_base, t, (1 << base_bit) - 1))
    dec = _dec_key_values(in_key.s, t, base_bit)         # [n, t, base-1]
    slot = N // torus_base
    e_of_coeff = jnp.arange(N) // slot                   # [N]
    mask = (e_of_coeff[None, :] ==
            jnp.arange(torus_base)[:, None]).astype(TORUS_DTYPE)  # [tb, N]
    add = dec[:, None, :, :, None] * mask[None, :, None, None, :]
    tab = tab.at[..., -1, :].add(add)
    return LUTPackingKSKey(table=tab, t=t, base_bit=base_bit,
                           torus_base=torus_base)


def _gather_subtract(table, a_vals, t: int, base_bit: int):
    """sum over (rows, digits) of table entries selected by the digits of
    a_vals — the dense version of the reference's `if aij != 0` subtract
    loops.  table: [R, t, base-1, k+1, N]; a_vals: [..., R] u64.
    Returns [..., k+1, N]."""
    R = table.shape[0]
    base_m1 = table.shape[2]
    prec_offset = TORUS_DTYPE(1 << (TORUS_BITS - (1 + base_bit * t)))
    mask = TORUS_DTYPE((1 << base_bit) - 1)
    shifts = jnp.array([TORUS_BITS - (j + 1) * base_bit for j in range(t)],
                       dtype=TORUS_DTYPE)
    dig = ((a_vals + prec_offset)[..., None] >> shifts) & mask  # [..., R, t]

    flat_tab = table.reshape(R * t * base_m1, table.shape[-2], table.shape[-1])
    # bound the gathered temp [batch, chunk, t, k+1, N] to ~64 MB; prefer a
    # chunk that divides R so the (multi-GB) table never needs a padded copy
    b_elems = 1
    for d in a_vals.shape[:-1]:
        b_elems *= d
    row_bytes = t * table.shape[-2] * table.shape[-1] * 8
    budget = min(R, max(1, (64 << 20) // max(1, b_elems * row_bytes)))
    chunk = 1
    for c in range(budget, 0, -1):
        if R % c == 0:
            chunk = c
            break
    n_chunks = R // chunk
    dig_s = jnp.moveaxis(
        dig.reshape(dig.shape[:-2] + (n_chunks, chunk, t)), -3, 0)
    tab_s = flat_tab.reshape((n_chunks, chunk * t * base_m1)
                             + flat_tab.shape[1:])
    # chunk-local flat position of entry (row, digit, 0)
    pos = (jnp.arange(chunk)[:, None] * t + jnp.arange(t)[None, :]) * base_m1

    def body(acc, xs):
        d, tb = xs
        nz = d != 0
        flat = pos + jnp.maximum(d.astype(jnp.int32) - 1, 0)
        g = jnp.take(tb, flat, axis=0)                 # [..., chunk, t, k+1, N]
        g = jnp.where(nz[..., None, None], g, TORUS_DTYPE(0))
        return acc + jnp.sum(g, axis=(-4, -3), dtype=TORUS_DTYPE), None

    init = jnp.zeros(a_vals.shape[:-1] + table.shape[-2:], TORUS_DTYPE)
    acc, _ = jax.lax.scan(body, init, (dig_s, tab_s))
    return acc


def _gather_subtract_streamed(seeds, b, k: int, a_vals, t: int,
                              base_bit: int):
    """Streamed (expand-on-select) `_gather_subtract` for seeded tables.

    The dense table never materializes: the digits of a_vals select one
    entry per (row, digit); only the 8-byte *seeds* of the selected entries
    are gathered, their masks expanded on the fly, and the stored b
    polynomials gathered alongside — the reference's USE_COMPRESSED_TRLWE
    apply does exactly this inside its subtract loop
    (`keyswitch.c:231-241,343-364`).  This is what lets packing1/priv-SK/
    LUT-packing switches run at TFHEPP_L2/SET_3 native sizes on one chip.

    seeds: [R, t, base-1, 2] u32; b: [R, t, base-1, N]; a_vals: [..., R].
    Returns [..., k+1, N]."""
    from . import seeded as _seeded
    R, _, base_m1, N = b.shape
    prec_offset = TORUS_DTYPE(1 << (TORUS_BITS - (1 + base_bit * t)))
    dmask = TORUS_DTYPE((1 << base_bit) - 1)
    shifts = jnp.array([TORUS_BITS - (j + 1) * base_bit for j in range(t)],
                       dtype=TORUS_DTYPE)
    dig = ((a_vals + prec_offset)[..., None] >> shifts) & dmask  # [..., R, t]

    flat_seeds = seeds.reshape(R * t * base_m1, 2)
    flat_b = b.reshape(R * t * base_m1, N)
    # bound the selected temp [batch, chunk, t, k+1, N] to ~64 MB
    b_elems = 1
    for d in a_vals.shape[:-1]:
        b_elems *= d
    row_bytes = t * (k + 1) * N * 8
    budget = min(R, max(1, (64 << 20) // max(1, b_elems * row_bytes)))
    chunk = 1
    for c in range(budget, 0, -1):
        if R % c == 0:
            chunk = c
            break
    n_chunks = R // chunk
    dig_s = jnp.moveaxis(
        dig.reshape(dig.shape[:-2] + (n_chunks, chunk, t)), -3, 0)
    seeds_s = flat_seeds.reshape(n_chunks, chunk * t * base_m1, 2)
    b_s = flat_b.reshape(n_chunks, chunk * t * base_m1, N)
    # chunk-local flat position of entry (row, digit, 0)
    pos = (jnp.arange(chunk)[:, None] * t + jnp.arange(t)[None, :]) * base_m1

    def body(acc, xs):
        d, sd_tab, b_tab = xs
        nz = d != 0
        flat = pos + jnp.maximum(d.astype(jnp.int32) - 1, 0)
        sd = jnp.take(sd_tab, flat, axis=0)     # [..., chunk, t, 2]
        bb = jnp.take(b_tab, flat, axis=0)      # [..., chunk, t, N]
        a = _seeded._expand_a(sd, k, N)         # [..., chunk, t, k, N]
        g = jnp.concatenate([a, bb[..., None, :]], axis=-2)
        g = jnp.where(nz[..., None, None], g, TORUS_DTYPE(0))
        return acc + jnp.sum(g, axis=(-4, -3), dtype=TORUS_DTYPE), None

    init = jnp.zeros(a_vals.shape[:-1] + (k + 1, N), TORUS_DTYPE)
    acc, _ = jax.lax.scan(body, init, (dig_s, seeds_s, b_s))
    return acc


def packing1_keyswitch(c: TLWE, ksk) -> TRLWE:
    """(`trlwe_packing1_keyswitch`, `keyswitch.c:458-475`).  Accepts a dense
    GenericKSKey or a SeededGenericKSKey (streamed, table never dense)."""
    if isinstance(ksk, SeededGenericKSKey):
        sub = _gather_subtract_streamed(ksk.seeds, ksk.b, ksk.k, c.a,
                                        ksk.t, ksk.base_bit)
    else:
        sub = _gather_subtract(ksk.table, c.a, ksk.t, ksk.base_bit)
    out = from_stacked(TORUS_DTYPE(0) - sub)
    b = out.b.at[..., 0].add(c.b)
    return TRLWE(a=out.a, b=b)


def priv_keyswitch(c: TLWE, ksk) -> TRLWE:
    """(`trlwe_priv_keyswitch`, `keyswitch.c:639-656`), includes b row.
    Accepts dense or seeded (streamed) keys."""
    assert ksk.include_b
    av = jnp.concatenate([c.a, c.b[..., None]], axis=-1)
    if isinstance(ksk, SeededGenericKSKey):
        sub = _gather_subtract_streamed(ksk.seeds, ksk.b, ksk.k, av,
                                        ksk.t, ksk.base_bit)
    else:
        sub = _gather_subtract(ksk.table, av, ksk.t, ksk.base_bit)
    return from_stacked(TORUS_DTYPE(0) - sub)


def lut_packing_keyswitch(cs: TLWE, ksk) -> TRLWE:
    """Pack torus_base TLWEs (leading axis of cs) into LUT slots
    (`trlwe_packing_keyswitch`, `keyswitch.c:343-364`).  Accepts a dense
    LUTPackingKSKey or a SeededLUTPackingKSKey (streamed)."""
    tb = ksk.torus_base
    n = cs.a.shape[-1]
    # a_vals[(i, e)] = cs.a[e, i] — note e-major per i
    a_vals = jnp.swapaxes(cs.a, -1, -2).reshape(cs.a.shape[:-2] + (n * tb,))
    if isinstance(ksk, SeededLUTPackingKSKey):
        seeds = ksk.seeds.reshape((-1,) + ksk.seeds.shape[2:])
        b_tab = ksk.b.reshape((-1,) + ksk.b.shape[2:])
        sub = _gather_subtract_streamed(seeds, b_tab, ksk.k, a_vals,
                                        ksk.t, ksk.base_bit)
    else:
        # reshape table [n, tb, t, base-1, ...] -> rows (i, e)
        table = ksk.table.reshape((-1,) + ksk.table.shape[2:])
        sub = _gather_subtract(table, a_vals, ksk.t, ksk.base_bit)
    out = from_stacked(TORUS_DTYPE(0) - sub)
    N = out.N
    slot = N // tb
    b_rep = jnp.repeat(cs.b, slot, axis=-1)            # [..., N]
    return TRLWE(a=out.a, b=out.b + b_rep)


# =========================================================================
# automorphisms / CDKS21 (`keyswitch.c:477-546`, `trlwe.c:775-781`)
# =========================================================================

def eval_automorphism(c: TRLWE, gen: int, ksk: TRLWEKSKey) -> TRLWE:
    """x^i -> x^(gen*i) then keyswitch back (`trlwe_eval_automorphism`)."""
    return trlwe_keyswitch(_trlwe.permute(c, gen), ksk)


def new_automorphism_ks_keyset(rkey, key: TRLWEKey, gens, t: int,
                               base_bit: int) -> dict:
    """KS keys for permuted keys s(X^gen) -> s (`trlwe_new_automorphism_
    KS_keyset{,_2}`, `keyswitch.c:500-524`).  Returns {gen: TRLWEKSKey}."""
    out = {}
    for i, gen in enumerate(gens):
        s_perm = _poly.permute(key.s.astype(TORUS_DTYPE), int(gen))
        key2 = TRLWEKey(s=s_perm.astype(jnp.int64), sigma=key.sigma,
                        s_bound=key.s_bound)
        out[int(gen)] = new_trlwe_ks_key(
            jax.random.fold_in(rkey, i), key, key2, t, base_bit)
    return out


def new_automorphism_ks_keyset_seeded(rkey, key: TRLWEKey, gens, t: int,
                                      base_bit: int) -> dict:
    """Seeded automorphism keyset: {gen: SeededTRLWEKSKey}.  The all-odd
    keyset is the storage giant (N generators; ~1.6 GiB at L2 dense) —
    seeding halves it; `eval_automorphism` accepts the entries
    transparently (masks regenerated per apply)."""
    out = {}
    for i, gen in enumerate(gens):
        s_perm = _poly.permute(key.s.astype(TORUS_DTYPE), int(gen))
        key2 = TRLWEKey(s=s_perm.astype(jnp.int64), sigma=key.sigma,
                        s_bound=key.s_bound)
        out[int(gen)] = new_trlwe_ks_key_seeded(
            jax.random.fold_in(rkey, i), key, key2, t, base_bit)
    return out


def all_odd_gens(N: int):
    return tuple(range(1, 2 * N, 2))


def new_cdks21_packing_keys(rkey, out_key: TRLWEKey, in_key: TLWEKey, t: int,
                            base_bit: int) -> list:
    """log N trace keys (`trlwe_new_packing1_KS_key_CDKS21`,
    `keyswitch.c:477-498`)."""
    N = out_key.N
    log_N = int(math.log2(N))
    s_emb = jnp.zeros((N,), jnp.int64).at[:in_key.n].set(in_key.s)
    keys = []
    for j in range(log_N):
        gen = (1 << (log_N - j)) + 1
        s_perm = _poly.permute(s_emb.astype(TORUS_DTYPE), gen).astype(jnp.int64)
        key2 = TRLWEKey(s=s_perm[None], sigma=in_key.sigma, s_bound=1)
        keys.append(new_trlwe_ks_key(
            jax.random.fold_in(rkey, j), out_key, key2, t, base_bit))
    return keys


def packing1_keyswitch_cdks21(c: TLWE, keys: list) -> TRLWE:
    """Trace-based packing (`trlwe_packing1_keyswitch_CDKS21`,
    `keyswitch.c:526-546`)."""
    N = keys[0].v.shape[-1]
    a0 = c.a[..., 0]
    rest = -c.a[..., 1:][..., ::-1]                    # a[N-i] = -a[i]
    a_poly = jnp.concatenate([a0[..., None], rest], axis=-1)
    if a_poly.shape[-1] < N:
        a_poly = jnp.concatenate(
            [a_poly[..., :1],
             jnp.zeros(a_poly.shape[:-1] + (N - c.a.shape[-1],), TORUS_DTYPE),
             a_poly[..., 1:]], axis=-1)
    b_poly = jnp.zeros_like(a_poly).at[..., 0].set(c.b)
    out = TRLWE(a=a_poly[..., None, :], b=b_poly)
    log_N = int(math.log2(N))
    for j in range(log_N):
        gen = (N >> j) + 1
        tmp = trlwe_keyswitch(_trlwe.permute(out, gen), keys[j])
        out = _trlwe.add(out, tmp)
    return out


# =========================================================================
# gadget -> RGSW conversion (`keyswitch.c:548-572`)
# =========================================================================

def new_gadget_to_rgsw_keys(rkey, key: TRLWEKey, t: int, base_bit: int):
    """One RLWE-priv-KS key per component with v = -s_i
    (`trlwe_new_gadget_to_RGSW_KS`)."""
    out = []
    for i in range(key.k):
        v = (TORUS_DTYPE(0) - key.s[i].astype(TORUS_DTYPE))
        out.append(new_rlwe_priv_ks_key(
            jax.random.fold_in(rkey, i), key, key, v, t, base_bit))
    return out


def trgsw_from_gadget(gadget: list, ksks: list, l: int, Bg_bit: int):
    """Assemble a TRGSW from l gadget TRLWEs (`trgsw_from_gadget`,
    `keyswitch.c:559-572`)."""
    from . import trgsw as _trgsw_mod
    k = gadget[0].k
    N = gadget[0].N
    rows = []
    for j in range(k):
        for i in range(l):
            rows.append(rlwe_priv_keyswitch(gadget[i], ksks[j]).stacked())
    for i in range(l):
        rows.append(gadget[i].stacked())
    rows = jnp.stack(rows, axis=-3)                     # [(k+1)l, k+1, N]
    g = _trgsw_mod.TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)
    return g
