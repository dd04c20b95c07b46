"""Native runtime library: PRNG expansion codecs vs independent oracles.

The C++ implementations are validated against pure-numpy/hashlib oracles
(and AES against the FIPS-197 known-answer test).  Either implementation
may serve `seeded.expand_mosfhet`; both must agree bit-exactly.
"""

import numpy as np
import pytest

from mosfhet_tpu import native


SEED = bytes(range(16))


def test_xoroshiro_native_vs_numpy():
    if not native.available():
        pytest.skip("native library not built")
    a = native.xoroshiro_expand(SEED, 3, 256)
    b = native.xoroshiro_expand_np(SEED, 3, 256)
    np.testing.assert_array_equal(a, b)


def test_xoroshiro_known_stream():
    """Scalar xoroshiro128++ 1.0 from its published reference behavior:
    the stream must be deterministic and state-dependent."""
    st = np.frombuffer(SEED, dtype="<u8").copy()
    v1 = native._xoro_next(st)
    v2 = native._xoro_next(st)
    assert v1 != v2
    st2 = np.frombuffer(SEED, dtype="<u8").copy()
    assert native._xoro_next(st2) == v1


def test_shake_vs_hashlib():
    assert native.shake128_expand(SEED, 1000) == \
        native.shake128_expand_np(SEED, 1000)
    assert native.shake256_expand(SEED, 777) == \
        native.shake256_expand_np(SEED, 777)


def test_shake128_empty_and_long():
    # multi-block absorb (> rate 168 bytes)
    longin = bytes(range(256)) * 2
    import hashlib
    if not native.available():
        pytest.skip("native library not built")
    out = np.zeros(64, np.uint8)
    import ctypes
    native._load().mosfhet_shake128(
        longin, len(longin),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 64)
    assert out.tobytes() == hashlib.shake_128(longin).digest(64)


def test_aes128_fips197_kat():
    if not native.available():
        pytest.skip("native library not built")
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert native.aes128_ctr(key, pt, 1).hex() == \
        "3925841d02dc09fbdc118597196a0b32"


def test_seeded_mosfhet_roundtrip():
    """A reference-format seeded sample decrypts after expansion."""
    import jax
    import jax.numpy as jnp
    from mosfhet_tpu import trlwe as _trlwe, seeded, torus
    N, k = 64, 1
    key = _trlwe.new_binary_key(jax.random.PRNGKey(0), N, k, 2.0**-40)
    # build a compressed sample manually with the reference expansion
    m = torus.double2torus(jnp.arange(N) / (2.0 * N))
    a = jnp.asarray(native.xoroshiro_expand(SEED, k, N))
    b = _trlwe._key_mul_accum(a, key) + m
    c = seeded.MosfhetSeededTRLWE(
        seed=jnp.asarray(np.frombuffer(SEED, np.uint8)), b=b, k=k)
    full = seeded.expand_mosfhet(c)
    ph = np.asarray(_trlwe.phase(full, key), np.uint64)
    np.testing.assert_array_equal(ph, np.asarray(m, np.uint64))
