"""Statistical RNG tests, porting `test_normal_generator` (`tests.c:70-120`)."""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import rng, torus


def test_normal_variance():
    key = jax.random.PRNGKey(0)
    sigma = 0.001
    n = 100_000
    t = rng.normal_torus(key, sigma, (n,))
    # interpret as signed torus values
    v = np.asarray(t).astype(np.int64).astype(np.float64) / 2.0**64
    var = np.sum(v * v) / (n - 1)
    assert abs(var - sigma**2) < 1e-5

    # sum of two variables -> 2 sigma^2
    k1, k2 = jax.random.split(key)
    t2 = rng.normal_torus(k1, sigma, (n,)) + rng.normal_torus(k2, sigma, (n,))
    v2 = np.asarray(t2).astype(np.int64).astype(np.float64) / 2.0**64
    var2 = np.sum(v2 * v2) / (n - 1)
    assert abs(var2 - 2 * sigma**2) < 1e-5


def test_normal_accumulated_torus():
    """10000-fold torus-accumulated gaussians keep variance 10000*sigma^2
    (the wraparound accumulation test, `tests.c:107-119`)."""
    key = jax.random.PRNGKey(3)
    sigma = 0.001
    t = rng.normal_torus(key, sigma, (200, 10_000))
    acc = np.asarray(jnp.sum(t, axis=-1, dtype=jnp.uint64))
    v = acc.astype(np.int64).astype(np.float64) / 2.0**64
    var = np.sum(v * v) / (len(v) - 1)
    assert abs(var - 10_000 * sigma**2) < 0.002


def test_uniform_torus_moments():
    key = jax.random.PRNGKey(1)
    u = rng.uniform_torus(key, (100_000,))
    x = np.asarray(torus.torus2double(u))
    assert abs(x.mean() - 0.5) < 0.005
    assert abs(x.var() - 1 / 12) < 0.005
    # all 64 bits exercised
    bits = np.bitwise_or.reduce(np.asarray(u))
    assert bits == np.uint64(0xFFFFFFFFFFFFFFFF)


def test_binary_and_bounded_keys():
    key = jax.random.PRNGKey(2)
    b = np.asarray(rng.binary_key_array(key, (10_000,)))
    assert set(np.unique(b)) <= {0, 1}
    assert 0.4 < b.mean() < 0.6
    q = np.asarray(rng.bounded_key_array(key, (10_000,), 8))
    assert q.min() >= -3 and q.max() <= 4
