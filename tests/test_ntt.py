"""Exactness tests for the CRT-NTT backend against Python big-int oracles.

The reference's FFT backend is validated by round-trip-within-2^40 and
naive-mult-within-2^40 (`tests.c:231-276`); the NTT backend is exact, so all
assertions here are bit-equality — strictly stronger than the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mosfhet_tpu import ntt, polynomial

RNG = np.random.default_rng(42)
M64 = 1 << 64


def rand_u64(shape):
    return RNG.integers(0, M64, size=shape, dtype=np.uint64)


def py_negacyclic_mul(a, b):
    """Oracle: exact negacyclic product mod 2^64 with Python ints."""
    N = len(a)
    out = [0] * N
    for i in range(N):
        for j in range(N):
            idx = i + j
            v = int(a[i]) * int(b[j])
            if idx >= N:
                out[idx - N] -= v
            else:
                out[idx] += v
    return np.array([v % M64 for v in out], dtype=np.uint64)


@pytest.mark.parametrize("N", [64, 256, 2048])
@pytest.mark.parametrize("primes", [ntt.DEFAULT_PRIMES, ntt.TENSOR_PRIMES])
def test_roundtrip_exact(N, primes):
    plan = ntt.get_plan(N, primes)
    x = jnp.asarray(rand_u64((3, N)))
    y = ntt.from_ntt_u64(ntt.to_ntt_u64(x, plan), plan)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize("N", [64, 256])
def test_mul_small_vs_oracle(N):
    """digit-poly (small signed) x torus-poly product, the hot-path shape."""
    plan = ntt.get_plan(N, ntt.DEFAULT_PRIMES)
    d = RNG.integers(-256, 256, size=N, dtype=np.int64)  # Bg_bit=9 digits
    b = rand_u64(N)
    got = polynomial.ntt_mul_small(jnp.asarray(d, jnp.int32), jnp.asarray(b), plan)
    want = py_negacyclic_mul(d.astype(np.uint64), b)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("N", [64, 128])
def test_mul_full_vs_oracle(N):
    """torus x torus with the wide plan (tensor-product range)."""
    a, b = rand_u64(N), rand_u64(N)
    got = polynomial.ntt_mul(jnp.asarray(a), jnp.asarray(b))
    want = py_negacyclic_mul(a, b)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_naive_oracle_matches_python():
    N = 64
    a, b = rand_u64(N), rand_u64(N)
    got = polynomial.naive_negacyclic_mul(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), py_negacyclic_mul(a, b))


def test_pointwise_mul_acc_key():
    """Lazy accumulated key products == sum of individual exact products."""
    N, J = 64, 8
    plan = ntt.get_plan(N, ntt.DEFAULT_PRIMES)
    digs = RNG.integers(-256, 256, size=(J, N), dtype=np.int64)
    keys = rand_u64((J, N))
    dig_ntt = ntt.to_ntt_small(jnp.asarray(digs, jnp.int32), plan)   # [J, P, N]
    key_ntt = ntt.to_ntt_u64(jnp.asarray(keys), plan)
    key_shoup = ntt.make_shoup(key_ntt, plan.p[:, None])
    acc = ntt.pointwise_mul_acc_key(dig_ntt, key_ntt, key_shoup, plan, axis=-3)
    got = ntt.from_ntt_u64(acc, plan)
    want = np.zeros(N, dtype=np.uint64)
    for j in range(J):
        want = want + py_negacyclic_mul(
            digs[j].astype(np.uint64), keys[j]
        )
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("bit_scale", [0, 1, 20, 63, 64])
def test_garner_shifted_u128(bit_scale):
    """full 128-bit product readback == Python (u128-wrapped) reference."""
    N = 64
    plan = ntt.get_plan(N, ntt.TENSOR_PRIMES)
    a, b = rand_u64(N), rand_u64(N)
    got = polynomial.full_mul_with_scale(
        jnp.asarray(a), jnp.asarray(b), bit_scale, plan
    )
    # python reference mimicking __uint128_t accumulation (karatsuba.c)
    M128 = 1 << 128
    acc = [0] * N
    for i in range(N):
        for j in range(N):
            v = int(a[i]) * int(b[j])
            idx = i + j
            if idx >= N:
                acc[idx - N] = (acc[idx - N] - v) % M128
            else:
                acc[idx] = (acc[idx] + v) % M128
    want = np.array(
        [((v >> bit_scale) % M64) for v in acc], dtype=np.uint64
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_batched_shapes():
    N = 64
    plan = ntt.get_plan(N, ntt.DEFAULT_PRIMES)
    x = jnp.asarray(rand_u64((2, 3, N)))
    f = ntt.to_ntt_u64(x, plan)
    assert f.shape == (2, 3, plan.P, N)
    y = ntt.from_ntt_u64(f, plan)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_narrow_primes_env_gates(monkeypatch):
    """MOSFHET_NTT_PRIMES=narrow only fires when the narrow set covers
    the bound AND (when N is passed) supports a 2N-th root: the set's
    min 2-adicity is 14, so N > 8192 must fall back to master primes
    instead of failing later at plan build."""
    monkeypatch.setenv("MOSFHET_NTT_PRIMES", "narrow")
    bound = ntt.conv_bound(2048, 1 << 8, 6)
    assert ntt.primes_for_bound(bound, 2048) == ntt.NARROW_PRIMES
    assert ntt.primes_for_bound(bound) == ntt.NARROW_PRIMES
    for p in ntt.primes_for_bound(bound, 16384):
        assert (p - 1) % (2 * 16384) == 0
    monkeypatch.delenv("MOSFHET_NTT_PRIMES")
    assert ntt.primes_for_bound(bound, 2048) != ntt.NARROW_PRIMES
