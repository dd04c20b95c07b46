"""Negacyclic rotation / permutation tests vs Python oracles
(reference `src/polynomial.c:184-235, 442-450`)."""

import numpy as np
import jax.numpy as jnp

from mosfhet_tpu import polynomial

RNG = np.random.default_rng(11)
M64 = 1 << 64


def py_mul_by_xai(x, a, N):
    a = a % (2 * N)
    out = np.zeros(N, dtype=np.uint64)
    for i in range(N):
        j = (i + a) % (2 * N)
        v = int(x[i]) if j < N else (M64 - int(x[i])) % M64
        out[j % N] = np.uint64(v)
    return out


def test_mul_by_xai_all_shifts():
    N = 32
    x = RNG.integers(0, M64, size=N, dtype=np.uint64)
    for a in list(range(0, 2 * N, 3)) + [0, N, 2 * N - 1]:
        got = np.asarray(polynomial.mul_by_xai(jnp.asarray(x), a))
        np.testing.assert_array_equal(got, py_mul_by_xai(x, a, N), err_msg=f"a={a}")


def test_mul_by_xai_batched_amounts():
    N, B = 32, 5
    x = RNG.integers(0, M64, size=(B, N), dtype=np.uint64)
    a = RNG.integers(0, 2 * N, size=(B,), dtype=np.int32)
    got = np.asarray(polynomial.mul_by_xai(jnp.asarray(x), jnp.asarray(a)))
    for b in range(B):
        np.testing.assert_array_equal(got[b], py_mul_by_xai(x[b], int(a[b]), N))


def test_mul_by_xai_minus_1():
    N = 32
    x = RNG.integers(0, M64, size=N, dtype=np.uint64)
    a = 7
    got = np.asarray(polynomial.mul_by_xai_minus_1(jnp.asarray(x), a))
    want = py_mul_by_xai(x, a, N) - x  # u64 wraps
    np.testing.assert_array_equal(got, want)
    # a = 0 -> exact zero (the CMUX skip-if-zero is a no-op by construction)
    got0 = np.asarray(polynomial.mul_by_xai_minus_1(jnp.asarray(x), 0))
    np.testing.assert_array_equal(got0, np.zeros(N, dtype=np.uint64))


def py_permute(x, gen, N):
    out = np.zeros(N, dtype=np.uint64)
    for i in range(N):
        idx = i * gen
        if idx & N:
            out[idx % N] = np.uint64((M64 - int(x[i])) % M64)
        else:
            out[idx % N] = x[i]
    return out


def test_permute_odd_gens():
    N = 64
    x = RNG.integers(0, M64, size=N, dtype=np.uint64)
    for gen in (1, 3, 5, 2 * N - 1, N + 1, 65):
        got = np.asarray(polynomial.permute(jnp.asarray(x), gen))
        np.testing.assert_array_equal(got, py_permute(x, gen, N), err_msg=f"gen={gen}")


def test_permute_mul_commutes():
    """permute(a*b) == permute(a) * permute(b) — the automorphism property."""
    N = 64
    a = RNG.integers(0, 1 << 20, size=N, dtype=np.uint64)
    b = RNG.integers(0, 1 << 20, size=N, dtype=np.uint64)
    gen = 5
    lhs = polynomial.permute(polynomial.ntt_mul(jnp.asarray(a), jnp.asarray(b)), gen)
    rhs = polynomial.ntt_mul(polynomial.permute(jnp.asarray(a), gen),
                             polynomial.permute(jnp.asarray(b), gen))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))
