"""Negacyclic polynomial arithmetic on u64 coefficient arrays [..., N].

Mirrors `src/polynomial.c`: rotations by X^a with sign-flip wraparound,
Galois permutations, naive O(N^2) oracle multiplication, and exact products
via the NTT backend.  All functions broadcast over leading batch axes, and
rotation amounts may be per-batch arrays (the blind rotate rotates every
ciphertext in the batch by its own exponent, `bootstrap.c:113-118`).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import ntt as _ntt
from .torus import TORUS_DTYPE


def _rot_gather(x, a, N):
    """out[..., i] = sign * x[..., (i - a) mod N] with negacyclic sign.

    a: int32 array broadcastable to x.shape[:-1] (amount mod 2N).
    """
    i = jnp.arange(N, dtype=jnp.int32)
    a = jnp.asarray(a, jnp.int32)
    m = (i - a[..., None]) % (2 * N)          # [..., N] in [0, 2N)
    neg = m >= N
    idx = jnp.where(neg, m - N, m)
    shape = jnp.broadcast_shapes(x.shape, idx.shape)
    g = jnp.take_along_axis(
        jnp.broadcast_to(x, shape), jnp.broadcast_to(idx, shape), axis=-1
    )
    return jnp.where(jnp.broadcast_to(neg, shape), -g, g)


def mul_by_xai(x, a):
    """x * X^a (negacyclic), `torus_polynomial_mul_by_xai`
    (`polynomial.c:184-199`).  a may be per-batch."""
    return _rot_gather(jnp.asarray(x, TORUS_DTYPE), a, x.shape[-1])


def mul_by_xai_minus_1(x, a):
    """x * (X^a - 1)  (`polynomial.c:220-235`)."""
    x = jnp.asarray(x, TORUS_DTYPE)
    return mul_by_xai(x, a) - x


def permute(x, gen: int):
    """Galois transform x^i -> x^(gen*i) (`polynomial_permute`,
    `polynomial.c:442-450`).  ``gen`` must be odd (all cryptographic uses
    are; the reference's even-gen behavior is a lossy scatter)."""
    N = x.shape[-1]
    assert gen % 2 == 1, "permute requires an odd Galois generator"
    ginv = pow(int(gen), -1, 2 * N)
    j = jnp.arange(N, dtype=jnp.int64)
    ic = (j * ginv) % (2 * N)
    neg = ic >= N
    idx = jnp.where(neg, ic - N, ic).astype(jnp.int32)
    g = jnp.take(jnp.asarray(x, TORUS_DTYPE), idx, axis=-1)
    return jnp.where(neg, -g, g)


def naive_negacyclic_mul(a, b):
    """Exact O(N^2) negacyclic product mod 2^64 — the differential-testing
    oracle (`polynomial_naive_mul_torus`, `polynomial.c:290-303`).

    a, b: [..., N] u64.  CPU/test use only (u64 einsum).
    """
    N = a.shape[-1]
    a = jnp.asarray(a, TORUS_DTYPE)
    b = jnp.asarray(b, TORUS_DTYPE)
    i = jnp.arange(N)[:, None]   # input index of b
    j = jnp.arange(N)[None, :]   # output index
    d = j - i
    sign = jnp.where(d < 0, TORUS_DTYPE(0) - TORUS_DTYPE(1), TORUS_DTYPE(1))
    idx = d % N
    # M[..., i, j] = sign(i,j) * a[..., (j-i) mod N]
    M = jnp.take(a, idx, axis=-1) * sign
    return jnp.sum(M * b[..., :, None], axis=-2, dtype=TORUS_DTYPE)


def ntt_mul(a, b, plan=None):
    """Exact negacyclic product of two torus polynomials mod 2^64 via the
    CRT-NTT backend (replaces `polynomial_mul_torus`, `polynomial.c:266-277`).

    Magnitude bound: both inputs centered < 2^63 would need ~2^138 of CRT
    range, so this general-purpose version uses the wide TENSOR_PRIMES plan.
    Hot paths (external products, key switching) use dedicated narrow plans
    on their small decomposed digits instead."""
    N = a.shape[-1]
    if plan is None:
        plan = _ntt.get_plan(N, _ntt.TENSOR_PRIMES)
    fa = _ntt.to_ntt_u64(jnp.asarray(a, TORUS_DTYPE), plan)
    fb = _ntt.to_ntt_u64(jnp.asarray(b, TORUS_DTYPE), plan)
    return _ntt.from_ntt_u64(_ntt.pointwise_mul(fa, fb, plan), plan)


def ntt_mul_small(a_small, b, plan):
    """Exact negacyclic product where ``a_small`` has small signed
    coefficients (secret keys, gadget digits).  Caller supplies a plan whose
    range covers N * max|a| * 2^63."""
    fa = _ntt.to_ntt_small(a_small, plan)
    fb = _ntt.to_ntt_u64(jnp.asarray(b, TORUS_DTYPE), plan)
    return _ntt.from_ntt_u64(_ntt.pointwise_mul(fa, fb, plan), plan)


def ntt_mul_small_small(a, b, bound_a: int, bound_b: int):
    """Exact signed product of two small-coefficient polynomials (secret-key
    products for relinearization/private KS keys, `keyswitch.c:3-10,39-47`).
    Returns int64 (|result| <= N * bound_a * bound_b must fit 2^62)."""
    N = a.shape[-1]
    bound = N * max(bound_a, 1) * max(bound_b, 1)
    assert bound < (1 << 62)
    plan = _ntt.get_plan(N, _ntt.primes_for_bound(bound, N))
    fa = _ntt.to_ntt_small(jnp.asarray(a, jnp.int64), plan)
    fb = _ntt.to_ntt_small(jnp.asarray(b, jnp.int64), plan)
    r = _ntt.from_ntt_u64(_ntt.pointwise_mul(fa, fb, plan), plan)
    return r.astype(jnp.int64)


def full_mul_with_scale(a, b, bit_scale: int, plan=None):
    """Exact 128-bit negacyclic product scaled down: round-free
    (coeff >> bit_scale as the reference's Karatsuba readback does,
    `fft/karatsuba.c:92-101`): out = (a (*) b) >> bit_scale mod 2^64.

    Replaces `polynomial_full_mul_with_scale` (`polynomial.c:429-437`).
    The shift of the exact signed 128-bit value is arithmetic; we compute
    it from the CRT digits without materializing 128-bit integers.
    """
    N = a.shape[-1]
    if plan is None:
        plan = _ntt.get_plan(N, _ntt.TENSOR_PRIMES)
    # unsigned representatives: mod-2^128 semantics (see to_resi_u64_raw)
    fa = _ntt.forward_ntt(_ntt.to_resi_u64_raw(jnp.asarray(a, TORUS_DTYPE), plan), plan)
    fb = _ntt.forward_ntt(_ntt.to_resi_u64_raw(jnp.asarray(b, TORUS_DTYPE), plan), plan)
    r = _ntt.inverse_ntt(_ntt.pointwise_mul(fa, fb, plan), plan)
    return _ntt.garner_shifted_u64(r, plan, bit_scale).astype(TORUS_DTYPE)


def torus_scale_round(x, log_scale: int):
    """out[i] = round(x[i] * 2^log_scale) (`polynomial_torus_scale`,
    `polynomial.c:322-326`)."""
    from .torus import torus2int
    return torus2int(x, log_scale).astype(TORUS_DTYPE)
