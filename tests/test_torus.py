"""Torus helper + gadget decomposition tests (reference `src/misc.c:9-28`,
`src/polynomial.c:55-89`)."""

import numpy as np
import jax.numpy as jnp

from mosfhet_tpu import torus

RNG = np.random.default_rng(7)
M64 = 1 << 64


def test_torus2int_matches_c():
    xs = RNG.integers(0, M64, size=100, dtype=np.uint64)
    for log_scale in (1, 4, 11, 12):
        got = np.asarray(torus.torus2int(jnp.asarray(xs), log_scale))
        off = 1 << (64 - log_scale - 1)
        want = np.array(
            [((int(x) + off) % M64) >> (64 - log_scale) for x in xs],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got, want)


def test_int2torus_roundtrip():
    for log_scale in (2, 8):
        vals = np.arange(1 << log_scale, dtype=np.uint64)
        t = torus.int2torus(jnp.asarray(vals), log_scale)
        back = torus.torus2int(t, log_scale)
        np.testing.assert_array_equal(np.asarray(back), vals)


def test_double2torus():
    assert int(torus.double2torus(0.5)) == 1 << 63
    assert int(torus.double2torus(-0.25)) == (M64 - (1 << 62)) % M64
    assert abs(float(torus.torus2double(torus.double2torus(0.123))) - 0.123) < 1e-9


def test_gadget_decompose_matches_c():
    """Digits match polynomial_decompose_i (rounded offset) bit-for-bit."""
    Bg_bit, l = 9, 4
    xs = RNG.integers(0, M64, size=64, dtype=np.uint64)
    got = np.asarray(torus.gadget_decompose(jnp.asarray(xs), Bg_bit, l))
    half = 1 << (Bg_bit - 1)
    mask = (1 << Bg_bit) - 1
    offset = (1 << (64 - l * Bg_bit - 1))
    for i in range(l):
        offset += 1 << (64 - i * Bg_bit - 1)
    for i in range(l):
        h_bit = 64 - (i + 1) * Bg_bit
        want = np.array(
            [(((int(x) + offset) % M64 >> h_bit) & mask) - half for x in xs],
            dtype=np.int32,
        )
        np.testing.assert_array_equal(got[i], want)


def test_gadget_recompose_error_bound():
    """x - recompose(decompose(x)) is bounded by the dropped tail
    (< 2^(64 - l*Bg_bit), plus rounding)."""
    Bg_bit, l = 9, 4
    xs = RNG.integers(0, M64, size=256, dtype=np.uint64)
    d = torus.gadget_decompose(jnp.asarray(xs), Bg_bit, l)
    rec = np.asarray(torus.gadget_recompose(d, Bg_bit))
    err = rec - xs  # u64 wraparound
    err_signed = err.view(np.int64)  # two's-complement reinterpret
    bound = 1 << (64 - l * Bg_bit - 1)
    assert np.all(np.abs(err_signed.astype(np.float64)) <= bound)
