"""TRLWE: ring-LWE over T_N[X] = R[X]/(X^N+1) with a leading batch axis.

Mirrors `src/trlwe.c`: key generation (binary/bounded/ternary/sparse/
gaussian), encryption, phase, linear ops, per-batch X^a rotations, sample
extraction (plain and multi-value), gadget decomposition, LUT packing, and
the NTT-domain ("DFT") representation with precomputed Shoup companions for
key material.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as _ntt
from . import polynomial as _poly
from . import rng as _rng
from .tlwe import TLWE, TLWEKey
from .torus import TORUS_DTYPE, gadget_decompose


@flax.struct.dataclass
class TRLWE:
    """Ciphertext (a_1..a_k, b) with b = sum a_i * s_i + m + e
    (`trlwe.c:296-316`)."""
    a: jax.Array  # [..., k, N] u64
    b: jax.Array  # [..., N]   u64

    @property
    def k(self):
        return self.a.shape[-2]

    @property
    def N(self):
        return self.b.shape[-1]

    def stacked(self):
        """[..., k+1, N] with b last — the decomposition/TRGSW row order."""
        return jnp.concatenate([self.a, self.b[..., None, :]], axis=-2)


def from_stacked(x) -> TRLWE:
    return TRLWE(a=x[..., :-1, :], b=x[..., -1, :])


@flax.struct.dataclass
class TRLWEDFT:
    """NTT-domain ciphertext: residues [..., k+1, P, N] (b last).

    ``vs`` optionally carries Shoup companions (present for key material that
    multiplies dynamic data on hot paths, absent for transient values).
    The prime set is static so ops can recover the NTTPlan."""
    v: jax.Array
    vs: jax.Array | None
    primes: tuple = flax.struct.field(pytree_node=False)

    @property
    def k(self):
        return self.v.shape[-3] - 1

    @property
    def N(self):
        return self.v.shape[-1]

    def plan(self):
        return _ntt.get_plan(self.N, self.primes)


@flax.struct.dataclass
class TRLWEKey:
    s: jax.Array  # [k, N] int64, small entries
    sigma: float = flax.struct.field(pytree_node=False)
    s_bound: int = flax.struct.field(pytree_node=False)  # max |s| (static)

    @property
    def k(self):
        return self.s.shape[0]

    @property
    def N(self):
        return self.s.shape[-1]

    def plan(self):
        """NTT plan wide enough for key-times-ciphertext products."""
        bound = _ntt.conv_bound(self.N, max(self.s_bound, 1), self.k)
        return _ntt.get_plan(self.N, _ntt.primes_for_bound(bound, self.N))


# --- key generation (`trlwe.c:104-228`) ------------------------------------

def new_bounded_key(key, N: int, k: int, bound: int, sigma: float) -> TRLWEKey:
    s = _rng.bounded_key_array(key, (k, N), bound)
    return TRLWEKey(s=s, sigma=sigma, s_bound=max(bound // 2, 1))


def new_binary_key(key, N: int, k: int, sigma: float) -> TRLWEKey:
    return new_bounded_key(key, N, k, 2, sigma)


def _sparse_values(key, size: int, h: int, values) -> jax.Array:
    """h nonzeros at uniform distinct positions; `gen_sparse_array`
    (`trlwe.c:137-155`) fills positions with `values` (already alternating
    for the ternary case)."""
    perm = jax.random.permutation(key, size)
    out = jnp.zeros((size,), jnp.int64)
    return out.at[perm[:h]].set(values)


def new_ternary_key(key, N: int, k: int, h: int, sigma: float) -> TRLWEKey:
    """Per-polynomial hamming weight h, alternating +1/-1 values
    (`trlwe_new_ternary_key`, `trlwe.c:158-165`)."""
    vals = jnp.where(jnp.arange(h) % 2 == 0, 1, -1).astype(jnp.int64)
    s = jnp.stack(
        [_sparse_values(jax.random.fold_in(key, i), N, h, vals) for i in range(k)]
    )
    return TRLWEKey(s=s, sigma=sigma, s_bound=1)


def new_sparse_ternary_key(key, N: int, k: int, h: int, sigma: float) -> TRLWEKey:
    """Total hamming weight h across all k polynomials (`trlwe.c:168-177`)."""
    vals = jnp.where(jnp.arange(h) % 2 == 0, 1, -1).astype(jnp.int64)
    s = _sparse_values(key, k * N, h, vals).reshape(k, N)
    return TRLWEKey(s=s, sigma=sigma, s_bound=1)


def new_sparse_binary_key(key, N: int, k: int, h: int, sigma: float) -> TRLWEKey:
    s = jnp.stack(
        [_sparse_values(jax.random.fold_in(key, i), N, h,
                        jnp.ones((h,), jnp.int64)) for i in range(k)]
    )
    return TRLWEKey(s=s, sigma=sigma, s_bound=1)


def _gaussian_ints(key, key_sigma: float, shape):
    g = jax.random.normal(key, shape, dtype=jnp.float32) * key_sigma
    return g.astype(jnp.int64)


def new_gaussian_key(key, N: int, k: int, key_sigma: float,
                     noise_sigma: float) -> TRLWEKey:
    """(`trlwe_new_gaussian_key`, `trlwe.c:219-228`)."""
    s = _gaussian_ints(key, key_sigma, (k, N))
    bound = int(max(1, np.max(np.abs(np.asarray(s)))))
    return TRLWEKey(s=s, sigma=noise_sigma, s_bound=bound)


def new_sparse_gaussian_key(key, N: int, k: int, h: int, key_sigma: float,
                            noise_sigma: float) -> TRLWEKey:
    """Sparse support, gaussian nonzero values (0 remapped to 1)
    (`trlwe.c:188-200`)."""
    kk, kv = jax.random.split(key)
    base = new_sparse_binary_key(kk, N, k, h, noise_sigma)
    g = _gaussian_ints(kv, key_sigma, (k, N))
    g = jnp.where(g == 0, 1, g)
    s = jnp.where(base.s == 1, g, 0)
    bound = int(max(1, np.max(np.abs(np.asarray(s)))))
    return TRLWEKey(s=s, sigma=noise_sigma, s_bound=bound)


def new_sparse_generic_key(key, N: int, k: int, h: int, key_bound: int,
                           noise_sigma: float) -> TRLWEKey:
    """Sparse support, bounded uniform nonzero values (`trlwe.c:203-217`)."""
    kk, kv = jax.random.split(key)
    base = new_sparse_binary_key(kk, N, k, h, noise_sigma)
    v = _rng.bounded_key_array(kv, (k, N), key_bound)
    v = jnp.where(v == 0, 1, v)
    s = jnp.where(base.s == 1, v, 0)
    return TRLWEKey(s=s, sigma=noise_sigma, s_bound=max(key_bound // 2, 1))


def extract_tlwe_key(key: TRLWEKey) -> TLWEKey:
    """TRLWE key -> k*N-dim TLWE key (`trlwe_extract_tlwe_key`,
    `trlwe.c:531-538`)."""
    return TLWEKey(s=key.s.reshape(-1), sigma=key.sigma)


# --- encryption / phase -----------------------------------------------------

def _key_mul_accum(a, key: TRLWEKey):
    """sum_i a_i (*) s_i, exact (the reference computes this with its FFT,
    `trlwe.c:307-309`; here it is exact via NTT)."""
    plan = key.plan()
    fa = _ntt.to_ntt_u64(a, plan)                       # [..., k, P, N]
    fs = _ntt.forward_ntt(_ntt.to_resi_small(key.s, plan), plan)
    prod = _ntt.pointwise_mul(fa, fs, plan)
    acc = prod[..., 0, :, :]
    for i in range(1, key.k):
        acc = _ntt.add(acc, prod[..., i, :, :], plan)
    return _ntt.from_ntt_u64(acc, plan)


def encrypt(m, key: TRLWEKey, rkey) -> TRLWE:
    """(`trlwe_sample`, `trlwe.c:296-316`).  m: [..., N] u64 or None."""
    N, k = key.N, key.k
    batch = () if m is None else jnp.asarray(m).shape[:-1]
    ka, ke = jax.random.split(rkey)
    a = _rng.uniform_torus(ka, batch + (k, N))
    e = _rng.normal_torus(ke, key.sigma, batch + (N,))
    b = _key_mul_accum(a, key) + e
    if m is not None:
        b = b + jnp.asarray(m, TORUS_DTYPE)
    return TRLWE(a=a, b=b)


def noiseless_trivial(m, k: int, N: int) -> TRLWE:
    """(`trlwe.c:261-280`).  m: [..., N] u64 or None."""
    if m is None:
        return TRLWE(a=jnp.zeros((k, N), TORUS_DTYPE),
                     b=jnp.zeros((N,), TORUS_DTYPE))
    m = jnp.asarray(m, TORUS_DTYPE)
    return TRLWE(a=jnp.zeros(m.shape[:-1] + (k, N), TORUS_DTYPE), b=m)


def phase(c: TRLWE, key: TRLWEKey):
    """b - sum a_i (*) s_i (`trlwe_phase`, `trlwe.c:324-331`)."""
    return c.b - _key_mul_accum(c.a, key)


# --- linear ops (`trlwe.c:384-529`) -----------------------------------------

def add(c1: TRLWE, c2: TRLWE) -> TRLWE:
    return TRLWE(a=c1.a + c2.a, b=c1.b + c2.b)


def sub(c1: TRLWE, c2: TRLWE) -> TRLWE:
    return TRLWE(a=c1.a - c2.a, b=c1.b - c2.b)


def neg(c: TRLWE) -> TRLWE:
    return TRLWE(a=TORUS_DTYPE(0) - c.a, b=TORUS_DTYPE(0) - c.b)


def scale(c: TRLWE, w) -> TRLWE:
    """coefficient-wise integer scale (`trlwe_scale`, `trlwe.c:269-274`)."""
    w = jnp.asarray(w, TORUS_DTYPE)
    return TRLWE(a=c.a * w[..., None, None], b=c.b * w[..., None])


def mul_by_xai(c: TRLWE, a) -> TRLWE:
    """Rotate all components by X^a; ``a`` may be per-batch
    (`trlwe_mul_by_xai`, `trlwe.c:507-513`)."""
    a_arr = jnp.asarray(a)
    return TRLWE(a=_poly.mul_by_xai(c.a, a_arr[..., None]),
                 b=_poly.mul_by_xai(c.b, a_arr))


def mul_by_xai_minus_1(c: TRLWE, a) -> TRLWE:
    a_arr = jnp.asarray(a)
    return TRLWE(a=_poly.mul_by_xai_minus_1(c.a, a_arr[..., None]),
                 b=_poly.mul_by_xai_minus_1(c.b, a_arr))


def permute(c: TRLWE, gen: int) -> TRLWE:
    """Galois automorphism on all components (first half of
    `trlwe_eval_automorphism`, `trlwe.c:775-781`)."""
    return TRLWE(a=_poly.permute(c.a, gen), b=_poly.permute(c.b, gen))


# --- sample extraction (`trlwe.c:540-620`) ----------------------------------

def extract_tlwe(c: TRLWE, idx: int = 0) -> TLWE:
    """TRLWE -> TLWE of coefficient `idx` of the phase
    (`trlwe_extract_tlwe`, `trlwe.c:540-552`).

    a'[i*N + j] = a_i[idx-j] for j <= idx, else -a_i[N+idx-j].
    """
    N, k = c.N, c.k
    j = np.arange(N)
    src = np.where(j <= idx, idx - j, N + idx - j)
    sign_neg = j > idx
    g = jnp.take(c.a, jnp.asarray(src), axis=-1)        # [..., k, N]
    g = jnp.where(jnp.asarray(sign_neg), TORUS_DTYPE(0) - g, g)
    a = g.reshape(g.shape[:-2] + (k * N,))
    return TLWE(a=a, b=c.b[..., idx])


def mv_extract_tlwe(c: TRLWE, amount: int) -> list[TLWE]:
    """Multi-value extraction: first amount/2 coefficients, then negated
    top coefficients (`trlwe_mv_extract_tlwe`, `trlwe.c:580-589`)."""
    from . import tlwe as _tlwe
    out = [extract_tlwe(c, i) for i in range(amount // 2)]
    for i in range(amount // 2, amount):
        e = extract_tlwe(c, c.N - 1 - (i - amount // 2))
        out.append(_tlwe.neg(e))
    return out


def mv_extract_tlwe_scaling_delta(c: TRLWE, scale_: int) -> TLWE:
    """The additive term of `trlwe_mv_extract_tlwe_scaling_addto`
    (`trlwe.c:602-610`): sum of low extracts minus top extracts."""
    from . import tlwe as _tlwe
    amount = scale_
    n_out = c.N * c.k
    out = _tlwe.noiseless_trivial(jnp.zeros(c.b.shape[:-1], TORUS_DTYPE), n_out)
    for i in range(amount // 2, amount):
        out = _tlwe.sub(out, extract_tlwe(c, c.N - 1 - (i - amount // 2)))
    for i in range(amount // 2):
        out = _tlwe.add(out, extract_tlwe(c, i))
    return out


def mv_extract_tlwe_scaling(c: TRLWE, scale_: int) -> TLWE:
    """Linear combination extract: sum of first scale/2 coefficients minus
    top ones — the message-composition trick
    (`trlwe_mv_extract_tlwe_scaling`, `trlwe.c:591-600`)."""
    from . import tlwe as _tlwe
    amount = scale_
    out = extract_tlwe(c, amount // 2)
    for i in range(amount // 2 + 1, amount):
        out = _tlwe.sub(out, extract_tlwe(c, c.N - 1 - (i - amount // 2)))
    for i in range(amount // 2):
        out = _tlwe.add(out, extract_tlwe(c, i))
    return out


# --- NTT-domain conversions --------------------------------------------------

def to_dft(c: TRLWE, plan: _ntt.NTTPlan, with_shoup: bool = False) -> TRLWEDFT:
    v = _ntt.to_ntt_u64(c.stacked(), plan)
    vs = _ntt.make_shoup(v, plan.p[:, None]) if with_shoup else None
    return TRLWEDFT(v=v, vs=vs, primes=plan.primes)


def from_dft(c: TRLWEDFT) -> TRLWE:
    return from_stacked(_ntt.from_ntt_u64(c.v, c.plan()))


def dft_add(c1: TRLWEDFT, c2: TRLWEDFT) -> TRLWEDFT:
    plan = c1.plan()
    return TRLWEDFT(v=_ntt.add(c1.v, c2.v, plan), vs=None, primes=c1.primes)


def dft_sub(c1: TRLWEDFT, c2: TRLWEDFT) -> TRLWEDFT:
    plan = c1.plan()
    return TRLWEDFT(v=_ntt.sub(c1.v, c2.v, plan), vs=None, primes=c1.primes)


def dft_phase(c: TRLWEDFT, key: TRLWEKey):
    """Decrypt directly in the NTT domain (`trlwe_DFT_phase`,
    `trlwe.c:372-382`)."""
    plan = c.plan()
    fs = _ntt.forward_ntt(_ntt.to_resi_small(key.s, plan), plan)
    prod = _ntt.pointwise_mul(c.v[..., :-1, :, :], fs, plan)
    acc = prod[..., 0, :, :]
    for i in range(1, key.k):
        acc = _ntt.add(acc, prod[..., i, :, :], plan)
    ph = _ntt.sub(c.v[..., -1, :, :], acc, plan)
    return _ntt.from_ntt_u64(ph, plan)


# --- gadget decomposition -----------------------------------------------------

def decompose(c: TRLWE, Bg_bit: int, l: int, rounded: bool = True):
    """All components' digits in TRGSW row order [..., (k+1)*l, N]
    (row = comp*l + digit, b last; `trlwe_decompose`, `trlwe.c:636-660`).
    The hot path uses the rounded offset like `polynomial_decompose_i`."""
    st = c.stacked()                                     # [..., k+1, N]
    d = gadget_decompose(st, Bg_bit, l, rounded)         # [..., k+1, l, N]
    return d.reshape(d.shape[:-3] + ((c.k + 1) * l, c.N))


# --- cleartext LUT packing (`trlwe.c:662-687`) --------------------------------

def torus_packing(values, k: int, N: int) -> TRLWE:
    """Trivial TRLWE whose b replicates each of `size` values into N/size
    slots (`trlwe_torus_packing`)."""
    values = jnp.asarray(values, TORUS_DTYPE)
    size = values.shape[-1]
    b = jnp.repeat(values, N // size, axis=-1)
    return noiseless_trivial(b, k, N)


def torus_packing_many_lut(values, lut_size: int, n_luts: int, k: int,
                           N: int) -> TRLWE:
    """b[(i*n_luts + j)*N/(lut_size*n_luts) + c] = in[j*lut_size + i]
    (`trlwe_torus_packing_many_LUT`, `trlwe.c:678-687`)."""
    values = jnp.asarray(values, TORUS_DTYPE).reshape(n_luts, lut_size)
    interleaved = jnp.swapaxes(values, -1, -2).reshape(-1)   # [(i, j)]
    b = jnp.repeat(interleaved, N // (lut_size * n_luts), axis=-1)
    return noiseless_trivial(b, k, N)


def lut_packing(values, in_prec: int, out_prec: int, k: int, N: int) -> TRLWE:
    """Integer LUT -> torus packing (`trlwe_LUT_packing`, `trlwe.c:669-675`)."""
    from .torus import int2torus
    values = int2torus(jnp.asarray(values, TORUS_DTYPE), out_prec)
    assert values.shape[-1] == 1 << in_prec
    return torus_packing(values, k, N)
