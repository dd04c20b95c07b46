"""Exact negacyclic NTT over 31-bit Proth primes with CRT readback to u64.

This module is the TPU-native replacement for the reference's pluggable f64
FFT backends (`src/fft/spqlios/*`, `src/fft/ffnt/*`).  Instead of floating
point (TPUs have no fast f64), polynomial products are computed *exactly*:

    u64 coefficients --(mod p_m)--> residues --NTT--> pointwise mul/acc
        --iNTT--> residues --Garner CRT--> exact value mod 2^64

The Chinese-remainder product of the primes exceeds twice the largest
possible negacyclic-convolution magnitude for each use case, so the CRT
reconstruction is exact and the final `mod 2^64` matches infinite-precision
integer arithmetic.  Compared with the reference, which tolerates ~2^-40
relative FFT error (`test/tests.c:238`), this backend contributes *zero*
noise — and it also subsumes the exact 128-bit Karatsuba path
(`src/fft/karatsuba.c`) by switching to a wider prime set.

Hot-loop arithmetic uses only u64 multiply/add/shift/compare (all native or
cheaply emulated on the TPU VPU):
  - Shoup multiplication for products with precomputed constants (twiddles,
    key material): 2 multiplies, 1 shift, 1 subtract, lazy in [0, 2p).
  - A small Barrett reduction for lazily accumulated sums.
u64 division only appears on cold paths (key import, on-the-fly Shoup
companions).

Transforms use the Longa-Naehrig merged-psi iteration: forward CT output is
bit-reversed, inverse GS consumes bit-reversed — pointwise products never
need an explicit bit-reversal permutation.

Array convention: residue tensors carry the prime axis second-to-last,
shape [..., P, N]; the polynomial axis N stays last (TPU lane dimension).
"""

from __future__ import annotations

import functools
import math

import jax
import numpy as np
import jax.numpy as jnp

# Proth primes p = c * 2^e + 1 with 2^21 | p-1 (supports N up to 2^20),
# ascending (Garner requires p_j < p_m for j < m to skip reductions).
# All in (2^28, 2^30): > 2^28 keeps the Barrett constants below in range,
# and < 2^30 keeps lazy values (< 2p) and butterfly sums (< 4p) inside
# uint32 — the requirement of the fused Pallas TPU kernel
# (`mosfhet_tpu/ops/pbs_kernel.py`), which does all modular arithmetic in
# native 32-bit integers.
MASTER_PRIMES = (943718401, 950009857, 962592769, 975175681,
                 985661441, 998244353, 1004535809, 1012924417)
DEFAULT_PRIMES = MASTER_PRIMES[-3:]   # 2^89.7 of CRT range
# Narrow-window primes (< 2^29, == 1 mod 16384): butterfly sums up to 8p
# still fit u32, enabling depth-3 lazy chains in the kernel's forward NTT
# (reduce every 3rd stage) — the ROADMAP perf candidate (a) ablation.
# Product 2^87.0 > the L2 external-product bound 2^86.
NARROW_PRIMES = (536608769, 536641537, 536690689)
# Wider set for exact "128-bit" products (tensor product / relinearization,
# reference `src/fft/karatsuba.c`): product ≈ 2^149.5 > 2 * N * 2^126.
TENSOR_PRIMES = MASTER_PRIMES[-5:]


def primes_for_bound(bound: int, N: int = None):
    """Smallest suffix of MASTER_PRIMES (largest primes first) whose product
    exceeds ``2 * bound`` — i.e. a prime set whose centered CRT range can
    represent any integer with |value| <= bound.

    MOSFHET_NTT_PRIMES=narrow selects `NARROW_PRIMES` instead whenever
    their range covers the bound (the depth-3 lazy-chain ablation,
    ROADMAP perf candidate (a)) — and, when the caller passes its ring
    dimension ``N``, only if every narrow prime supports a 2N-th root
    (min 2-adicity of the set is 14, so N <= 8192); otherwise the env
    flag silently falls back to the master set instead of failing later
    at plan build."""
    import os
    if os.environ.get("MOSFHET_NTT_PRIMES") == "narrow":
        prod = 1
        ok = True
        for p in NARROW_PRIMES:
            prod *= p
            if N is not None and (p - 1) % (2 * N) != 0:
                ok = False
        if ok and prod > 2 * bound:
            return NARROW_PRIMES
    chosen = []
    prod = 1
    for p in reversed(MASTER_PRIMES):
        chosen.append(p)
        prod *= p
        if prod > 2 * bound:
            return tuple(sorted(chosen))
    raise ValueError(f"bound 2^{math.log2(float(bound)):.1f} exceeds CRT capacity")


def conv_bound(N: int, max_abs_digit: int, j_terms: int) -> int:
    """Magnitude bound for sum_{j<J} digit_poly_j (*) torus_poly_j with
    |digits| <= max_abs_digit and centered torus coefficients <=
    2^(TORUS_BITS-1)."""
    from .torus import TORUS_BITS
    return N * max_abs_digit * (1 << (TORUS_BITS - 1)) * j_terms


def external_product_bound(N: int, Bg_bit: int, l: int, k: int) -> int:
    """Prime-budget bound for the blind-rotate external product.

    2x the raw convolution bound: the rotation-free CMUX step
    (MOSFHET_ROT_NTT) reconstructs (X^a - 1) * sum_j d_j (*) key_j, whose
    coefficients are differences of two convolution coefficients.  The
    factor changes no registered parameter set's prime count (the master
    suffixes have > 1 bit of slack everywhere), so the same keys serve
    both step algorithms."""
    return 2 * conv_bound(N, 1 << (Bg_bit - 1), (k + 1) * l)


def rot_ntt_enabled() -> bool:
    """MOSFHET_ROT_NTT=1 selects the rotation-free blind-rotate step: the
    accumulator is gadget-decomposed directly and the (X^a - 1) factor is
    applied as a per-row twiddle vector (zeta^a - 1) to the NTT-domain
    accumulator — no coefficient-domain rotation (11 conditional u64
    lane-rolls per component) anywhere in the step.  Exact: rotation
    commutes with gadget recomposition; the 2x reconstruction bound is
    covered by `external_product_bound`.  Needs the dynamic-operand
    Barrett window (plan.barrett_ok) — silently falls back to the
    rotation step on narrow-prime plans."""
    import os
    return os.environ.get("MOSFHET_ROT_NTT", "0") == "1"


def xpow(a_int, plan: "NTTPlan"):
    """Monomial spectra zeta^a: a_int [...] int32 in [0, 2N] ->
    [..., P, N] u64 canonical residues of NTT(X^a).

    logN+1 conditional Shoup multiplies over the set bits of a (bit
    log2(2N), i.e. a == 2N, is the identity and needs no row)."""
    x = jnp.ones(a_int.shape + (plan.P, plan.N), jnp.uint64)
    pp = plan.p[:, None]
    for j in range(plan.logN + 1):
        bit = ((a_int >> j) & 1)[..., None, None] == 1
        xm = shoup_mul(x, plan.xpow2[:, j], plan.xpow2_shoup[:, j], pp)
        x = jnp.where(bit, xm, x)
    return x

_U64 = jnp.uint64


def _factorize(n: int):
    fs = {}
    d = 2
    while d * d <= n:
        while n % d == 0:
            fs[d] = fs.get(d, 0) + 1
            n //= d
        d += 1
    if n > 1:
        fs[n] = fs.get(n, 0) + 1
    return fs


def _primitive_root(p: int) -> int:
    fs = _factorize(p - 1)
    for g in range(2, 1000):
        if all(pow(g, (p - 1) // q, p) != 1 for q in fs):
            return g
    raise ValueError(f"no primitive root found for {p}")


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _shoup_companion(w: int, p: int) -> int:
    return (w << 32) // p


class NTTPlan:
    """Precomputed tables for negacyclic NTTs of length N over a prime set."""

    def __init__(self, N: int, primes=DEFAULT_PRIMES):
        # Plans are cached; they may be first requested inside a jit trace,
        # so force concrete (compile-time) array creation or the cache would
        # capture tracers.
        with jax.ensure_compile_time_eval():
            self._build(N, primes)

    def _build(self, N: int, primes):
        assert N & (N - 1) == 0
        self.N = N
        self.logN = int(math.log2(N))
        self.primes = tuple(primes)
        self.P = len(self.primes)
        assert list(self.primes) == sorted(self.primes)

        psi_rev = np.zeros((self.P, N), dtype=np.uint64)
        psi_rev_sh = np.zeros((self.P, N), dtype=np.uint64)
        ipsi_rev = np.zeros((self.P, N), dtype=np.uint64)
        ipsi_rev_sh = np.zeros((self.P, N), dtype=np.uint64)
        n_inv = np.zeros((self.P,), dtype=np.uint64)
        n_inv_sh = np.zeros((self.P,), dtype=np.uint64)

        psi_roots = []
        for m, p in enumerate(self.primes):
            assert (p - 1) % (2 * N) == 0, f"{p} has no 2N-th root for N={N}"
            g = _primitive_root(p)
            psi = pow(g, (p - 1) // (2 * N), p)
            psi_roots.append(psi)
            ipsi = pow(psi, p - 2, p)
            for i in range(N):
                b = _bitrev(i, self.logN)
                w = pow(psi, b, p)
                iw = pow(ipsi, b, p)
                psi_rev[m, i] = w
                psi_rev_sh[m, i] = _shoup_companion(w, p)
                ipsi_rev[m, i] = iw
                ipsi_rev_sh[m, i] = _shoup_companion(iw, p)
            ninv = pow(N, p - 2, p)
            n_inv[m] = ninv
            n_inv_sh[m] = _shoup_companion(ninv, p)

        self.p = jnp.asarray(np.array(self.primes, dtype=np.uint64))
        self.mu = jnp.asarray(
            np.array([(1 << 60) // p for p in self.primes], dtype=np.uint64)
        )
        # `barrett_mul` (two conditional subtractions) is exact only when its
        # quotient underestimate is < 3, i.e. 2^30/p + 1.25 < 3  ->
        # p > 2^30 / 1.75 — stricter than the framework-wide (2^28, 2^30)
        # prime window.  Narrow-prime plans (the lazy-chain ablation,
        # `NARROW_PRIMES`) cannot use the dynamic-operand Barrett paths;
        # `barrett_mul` asserts the flag.
        self.barrett_ok = min(self.primes) > (1 << 30) // 1.75
        self.mu62 = jnp.asarray(
            np.array([(1 << 62) // p if self.barrett_ok else 0
                      for p in self.primes], dtype=np.uint64)
        )
        self.psi_rev = jnp.asarray(psi_rev)
        self.psi_rev_shoup = jnp.asarray(psi_rev_sh)
        self.ipsi_rev = jnp.asarray(ipsi_rev)
        self.ipsi_rev_shoup = jnp.asarray(ipsi_rev_sh)
        self.n_inv = jnp.asarray(n_inv)
        self.n_inv_shoup = jnp.asarray(n_inv_sh)

        # --- monomial spectra: NTT-domain rotation tables ----------------
        # Spec position i of the forward DIF output is the evaluation of
        # the input polynomial at zeta_i = psi^(2*bitrev(i)+1), so
        # multiplying by the monomial X^a is DIAGONAL in the NTT domain:
        # NTT(X^a (*) u)[i] = zeta_i^a * NTT(u)[i] for any a in [0, 2N]
        # (zeta_i^N = -1 covers the negacyclic wrap).  xpow2[m, j] holds
        # zeta^(2^j) so zeta^a is a product over the set bits of a — the
        # rotation-free blind-rotate step (`bootstrap._cmux_step_rotntt`,
        # `ops/pbs_kernel` MOSFHET_ROT_NTT path) builds it with logN+1
        # conditional Shoup multiplies shared across all digit rows.
        xpow2 = np.zeros((self.P, self.logN + 1, N), np.uint64)
        xpow2_sh = np.zeros((self.P, self.logN + 1, N), np.uint64)
        for m, p in enumerate(self.primes):
            # zeta = psi_rev^2 * psi  (psi_rev[i] = psi^bitrev(i) < 2^30)
            z = (psi_rev[m] * psi_rev[m] % np.uint64(p)) \
                * np.uint64(psi_roots[m]) % np.uint64(p)
            for j in range(self.logN + 1):
                xpow2[m, j] = z
                xpow2_sh[m, j] = (z << np.uint64(32)) // np.uint64(p)
                z = z * z % np.uint64(p)
        self.xpow2 = jnp.asarray(xpow2)
        self.xpow2_shoup = jnp.asarray(xpow2_sh)

        # --- Garner mixed-radix CRT constants ---------------------------
        # t_m = (r_m - sum_{j<m} t_j * prefix_j) * inv(prefix_m) mod p_m,
        # where prefix_j = p_0 * ... * p_{j-1}.
        self.garner_w = []        # [m][j] -> (prefix_j mod p_m, shoup)
        self.garner_cinv = []     # [m] -> (inv(prefix_m) mod p_m, shoup)
        for m in range(self.P):
            p = self.primes[m]
            row = []
            prefix = 1
            for j in range(m):
                w = prefix % p
                row.append((jnp.uint64(w), jnp.uint64(_shoup_companion(w, p))))
                prefix *= self.primes[j]
            self.garner_w.append(row)
            if m > 0:
                c = pow(prefix % p, p - 2, p)
                self.garner_cinv.append(
                    (jnp.uint64(c), jnp.uint64(_shoup_companion(c, p)))
                )
            else:
                self.garner_cinv.append(None)
        self.p_u64 = [jnp.uint64(p) for p in self.primes]
        self.half_last = jnp.uint64(self.primes[-1] // 2)
        # Max possible |value| the CRT range supports (for callers to assert
        # their convolution bound fits): prod(primes) // 2.
        self.crt_half_range = 1
        for p in self.primes:
            self.crt_half_range *= p
        self.crt_half_range //= 2


@functools.lru_cache(maxsize=None)
def get_plan(N: int, primes=DEFAULT_PRIMES) -> NTTPlan:
    return NTTPlan(N, primes)


# --- modular primitives (all operate on u64 arrays) ----------------------

def shoup_mul_lazy(a, w, w_shoup, p):
    """a*w mod p, result in [0, 2p).  Requires a < 2^31 (i.e. fully reduced
    inputs for p < 2^31) and w < p, with w_shoup = floor(w * 2^32 / p)."""
    q = (a * w_shoup) >> jnp.uint64(32)
    return a * w - q * p


def shoup_mul(a, w, w_shoup, p):
    r = shoup_mul_lazy(a, w, w_shoup, p)
    return jnp.where(r >= p, r - p, r)


def make_shoup(w, p):
    """On-the-fly Shoup companion (uses u64 division — cold paths only)."""
    return (w << jnp.uint64(32)) // p


def barrett_mul(a, b, plan: "NTTPlan"):
    """Generic a * b mod p without a precomputed Shoup companion and
    without division: Barrett with mu62 = floor(2^62 / p).

    a, b: residues in [0, p) with 2^29.5 < p < 2^30 (every MASTER prime)
    -> z = a*b < 2^60; q = ((z >> 30) * mu62) >> 32 underestimates z/p by
    < 2.4, so two conditional subtractions return the exact value.
    Replaces `make_shoup` on hot paths that multiply two dynamic operands
    (e.g. the unfolded blind rotate's per-step combined TRGSW)."""
    assert plan.barrett_ok, \
        "barrett_mul needs all primes > 2^30/1.75 (narrow-prime plan)"
    pp = plan.p[:, None]
    mu = plan.mu62[:, None]
    z = a * b
    q = ((z >> jnp.uint64(30)) * mu) >> jnp.uint64(32)
    r = z - q * pp
    r = jnp.where(r >= pp, r - pp, r)
    return jnp.where(r >= pp, r - pp, r)


def barrett_small(z, p, mu):
    """z mod p for z < 2^59, with mu = floor(2^60 / p), p > 2^28."""
    q = ((z >> jnp.uint64(28)) * mu) >> jnp.uint64(32)
    r = z - q * p
    two_p = p << jnp.uint64(1)
    r = jnp.where(r >= two_p, r - two_p, r)
    return jnp.where(r >= p, r - p, r)


def to_resi_u64(x, plan: NTTPlan):
    """u64 torus coefficients [..., N] -> residues [..., P, N].

    Coefficients are centered to their signed representatives first (a
    two's-complement reinterpret); this halves the integer magnitude bound
    of downstream convolutions, and the final `mod 2^TB` readback is
    unaffected (representatives differ by multiples of 2^TB).  Cold path
    (u64 remainder).  Width-generic: u32 torus inputs center via int32."""
    from .torus import SIGNED_DTYPE, TORUS_DTYPE
    return to_resi_i64(jnp.asarray(x, TORUS_DTYPE).astype(SIGNED_DTYPE), plan)


def to_resi_u64_raw(x, plan: NTTPlan):
    """u64 coefficients -> residues of the *unsigned* representative.

    Needed where mod-2^128 (not mod-2^64) semantics matter: the exact
    tensor-product path accumulates unsigned 64x64 products in a wrapping
    128-bit integer (`fft/karatsuba.c:61-90`), so the integer being CRT'd
    must be built from unsigned representatives to reproduce the high limb.
    """
    return jnp.asarray(x, jnp.uint64)[..., None, :] % plan.p[:, None]


def to_resi_i64(x, plan: NTTPlan):
    """Signed int64 coefficients (e.g. secret keys) -> residues [..., P, N]."""
    r = x[..., None, :].astype(jnp.int64) % plan.p[:, None].astype(jnp.int64)
    return r.astype(jnp.uint64)


def to_resi_small(d, plan: NTTPlan):
    """Small signed digits (|d| < min p) [..., N] -> residues [..., P, N].
    Division-free hot path for gadget-decomposed digits."""
    d = d.astype(jnp.int64)[..., None, :]
    p = plan.p[:, None].astype(jnp.int64)
    return jnp.where(d < 0, d + p, d).astype(jnp.uint64)


# --- transforms -----------------------------------------------------------

def forward_ntt(x, plan: NTTPlan):
    """Negacyclic forward NTT over the last axis.

    x: [..., P, N] u64 residues in [0, p).  Output (bit-reversed order)
    residues in [0, p).  Cooley-Tukey with merged psi powers — the
    algorithmic spec is the same transform the reference computes with
    SPQLIOS assembly (`src/fft/spqlios/spqlios-fft-impl.c`), done exactly.
    """
    N, P = plan.N, plan.P
    batch = x.shape[:-2]
    m, t = 1, N
    while m < N:
        t //= 2
        xr = x.reshape(batch + (P, m, 2, t))
        U = xr[..., 0, :]
        V = xr[..., 1, :]
        S = plan.psi_rev[:, m:2 * m][:, :, None]
        Ss = plan.psi_rev_shoup[:, m:2 * m][:, :, None]
        pp = plan.p[:, None, None]
        Vw = shoup_mul(V, S, Ss, pp)
        add = U + Vw
        add = jnp.where(add >= pp, add - pp, add)
        sub = U + pp - Vw
        sub = jnp.where(sub >= pp, sub - pp, sub)
        x = jnp.stack([add, sub], axis=-2).reshape(batch + (P, N))
        m *= 2
    return x


def inverse_ntt(x, plan: NTTPlan):
    """Inverse of `forward_ntt` (consumes bit-reversed order), including the
    1/N scaling.  Output residues in [0, p)."""
    N, P = plan.N, plan.P
    batch = x.shape[:-2]
    t, h = 1, N // 2
    while h >= 1:
        xr = x.reshape(batch + (P, h, 2, t))
        U = xr[..., 0, :]
        V = xr[..., 1, :]
        S = plan.ipsi_rev[:, h:2 * h][:, :, None]
        Ss = plan.ipsi_rev_shoup[:, h:2 * h][:, :, None]
        pp = plan.p[:, None, None]
        add = U + V
        add = jnp.where(add >= pp, add - pp, add)
        diff = U + pp - V
        diff = jnp.where(diff >= pp, diff - pp, diff)
        W = shoup_mul(diff, S, Ss, pp)
        x = jnp.stack([add, W], axis=-2).reshape(batch + (P, N))
        t *= 2
        h //= 2
    pp = plan.p[:, None]
    x = shoup_mul(x, plan.n_inv[:, None], plan.n_inv_shoup[:, None], pp)
    return x


def garner_u64(r, plan: NTTPlan):
    """Residues [..., P, N] -> exact signed CRT value reduced mod 2^64.

    Mixed-radix (Garner) reconstruction; the top digit is centered, so any
    integer with |value| < prod(p)/2 round-trips exactly — the caller must
    keep its convolution magnitudes within `plan.crt_half_range`.
    """
    P = plan.P
    ts = [r[..., 0, :]]
    for m in range(1, P):
        p = plan.p_u64[m]
        mu = plan.mu[m]
        acc = ts[0]
        for j in range(1, m):
            w, ws = plan.garner_w[m][j]
            acc = acc + shoup_mul_lazy(ts[j], w, ws, p)
        if m > 1:
            acc = barrett_small(acc, p, mu)
        diff = r[..., m, :] + p - acc
        diff = jnp.where(diff >= p, diff - p, diff)
        c, cs = plan.garner_cinv[m]
        ts.append(shoup_mul(diff, c, cs, p))
    # center top digit, then Horner mod 2^64
    top = ts[-1]
    v = jnp.where(top > plan.half_last, top - plan.p_u64[P - 1], top)
    for m in range(P - 2, -1, -1):
        v = v * plan.p_u64[m] + ts[m]
    return v


def garner_u128(r, plan: NTTPlan):
    """Residues -> value mod 2^128 as two u64 limbs (lo, hi).

    Matches the reference's exact path, which accumulates negacyclic
    products in `__uint128_t` (wrapping mod 2^128, `fft/karatsuba.c:61-90`):
    the mixed-radix Horner below wraps mod 2^128 the same way.  The top
    Garner digit is centered, so negative values appear in two's complement.
    """
    P = plan.P
    ts = [r[..., 0, :]]
    for m in range(1, P):
        p = plan.p_u64[m]
        mu = plan.mu[m]
        acc = ts[0]
        for j in range(1, m):
            w, ws = plan.garner_w[m][j]
            acc = acc + shoup_mul_lazy(ts[j], w, ws, p)
        if m > 1:
            acc = barrett_small(acc, p, mu)
        diff = r[..., m, :] + p - acc
        diff = jnp.where(diff >= p, diff - p, diff)
        c, cs = plan.garner_cinv[m]
        ts.append(shoup_mul(diff, c, cs, p))
    top = ts[-1]
    neg = top > plan.half_last
    lo = jnp.where(neg, top - plan.p_u64[P - 1], top)
    hi = jnp.where(neg, ~jnp.uint64(0), jnp.uint64(0))
    mask32 = jnp.uint64(0xFFFFFFFF)
    for m in range(P - 2, -1, -1):
        p = plan.p_u64[m]          # p < 2^31
        l0 = lo & mask32
        l1 = lo >> jnp.uint64(32)
        a = l0 * p                 # <= 2^63
        b = l1 * p                 # <= 2^63
        lo2 = a + (b << jnp.uint64(32))
        carry = jnp.where(lo2 < a, jnp.uint64(1), jnp.uint64(0))
        hi = hi * p + (b >> jnp.uint64(32)) + carry
        lo3 = lo2 + ts[m]
        hi = hi + jnp.where(lo3 < lo2, jnp.uint64(1), jnp.uint64(0))
        lo = lo3
    return lo, hi


def garner_shifted_u64(r, plan: NTTPlan, bit_scale: int):
    """((value mod 2^128) >> bit_scale) mod 2^64 — the readback used by the
    exact tensor-product path (`karatsuba_u128_scale64`,
    `fft/karatsuba.c:92-101`).  0 <= bit_scale <= 64, logical shift."""
    lo, hi = garner_u128(r, plan)
    if bit_scale == 0:
        return lo
    if bit_scale == 64:
        return hi
    s = jnp.uint64(bit_scale)
    return (lo >> s) | (hi << jnp.uint64(64 - bit_scale))


def from_ntt_u64(x, plan: NTTPlan):
    """[..., P, N] NTT-domain -> exact torus coefficients [..., N].

    Returns TORUS_DTYPE; the Garner value is exact mod 2^64 and its
    truncation to 32 bits is exact mod 2^32 under TORUS32."""
    from .torus import TORUS_DTYPE
    return garner_u64(inverse_ntt(x, plan), plan).astype(TORUS_DTYPE)


def to_ntt_u64(x, plan: NTTPlan):
    """u64 coefficients [..., N] -> NTT domain [..., P, N] (cold path)."""
    return forward_ntt(to_resi_u64(x, plan), plan)


def to_ntt_small(d, plan: NTTPlan):
    """Small signed digits [..., N] -> NTT domain (division-free hot path)."""
    return forward_ntt(to_resi_small(d, plan), plan)


# --- pointwise algebra in NTT domain -------------------------------------

def pointwise_mul(a, b, plan: NTTPlan):
    """Generic pointwise product (both operands dynamic, cold-ish path)."""
    pp = plan.p[:, None]
    bs = make_shoup(b, pp)
    return shoup_mul(a, b, bs, pp)


def pointwise_mul_key(a, key_val, key_shoup, plan: NTTPlan):
    """Pointwise product against precomputed key material (hot path)."""
    pp = plan.p[:, None]
    return shoup_mul(a, key_val, key_shoup, pp)


def pointwise_mul_acc_generic(a, b, plan: NTTPlan, axis: int):
    """sum over `axis` of a * b for two dynamic operands (no precomputed
    Shoup companions): exact Barrett products, lazy u64 accumulation.
    Reduction length J must satisfy J * p < 2^59."""
    prods = barrett_mul(a, b, plan)
    s = jnp.sum(prods, axis=axis, dtype=jnp.uint64)
    pp = plan.p[:, None]
    return barrett_small(s, pp, plan.mu[:, None])


def pointwise_mul_acc_key(a, key_val, key_shoup, plan: NTTPlan, axis: int):
    """sum over `axis` of a * key, all in NTT domain.

    a:        [..., J, ..., P, N] u64 (fully reduced)
    key_val:  broadcast-compatible, with Shoup companions
    Products are kept lazy in [0, 2p) and accumulated in u64; the reduction
    axis length J must satisfy J * 2p < 2^59 (J < 2^27 — always true here).
    """
    pp = plan.p[:, None]
    prods = shoup_mul_lazy(a, key_val, key_shoup, pp)
    s = jnp.sum(prods, axis=axis, dtype=jnp.uint64)
    return barrett_small(s, pp, plan.mu[:, None])


def add(a, b, plan: NTTPlan):
    pp = plan.p[:, None]
    s = a + b
    return jnp.where(s >= pp, s - pp, s)


def sub(a, b, plan: NTTPlan):
    pp = plan.p[:, None]
    d = a + pp - b
    return jnp.where(d >= pp, d - pp, d)


def neg(a, plan: NTTPlan):
    pp = plan.p[:, None]
    return jnp.where(a == 0, a, pp - a)


def scale_u64(a, c, plan: NTTPlan):
    """Multiply NTT-domain values by an u64 scalar (matches the reference's
    `polynomial_scale_and_add_DFT_polynomials` semantics where DFT values are
    scaled by an integer, `polynomial.c:106-120`)."""
    pp = plan.p[:, None]
    cr = jnp.asarray(c, jnp.uint64) % pp
    return pointwise_mul(a, jnp.broadcast_to(cr, a.shape), plan)
