"""Leveled LUT evaluation app (`applications/leveled_lut/`): direct lookup
via one external product, and the CGGI20 vertical-packing big-LUT
(CMUX tree over high bits + powers-of-two blind rotate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosfhet_tpu import params, tlwe, trlwe, trgsw, torus
from mosfhet_tpu.apps import leveled_lut as ll

P = params.TOY  # n=16, N=64


@pytest.fixture(scope="module")
def keys():
    k0, k1 = jax.random.split(jax.random.PRNGKey(99))
    key_trlwe = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    return key_trlwe, gk


def test_leveled_lut_lookup(keys):
    key_trlwe, gk = keys
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    out_prec = 7                        # N-entry LUT (one slot per coeff)
    values = jnp.asarray((np.arange(P.N) * 7) % (1 << out_prec))
    k0, k1 = jax.random.split(jax.random.PRNGKey(5))
    enc_lut = ll.encrypt_lut(values, out_prec, key_trlwe, k0)
    for m in (0, 3, 17, 63):
        enc_in = ll.encrypt_input(m, gk, jax.random.fold_in(k1, m))
        out = ll.eval_lut(enc_in, enc_lut)
        ph = np.uint64(np.asarray(tlwe.phase(out, key_out)))
        want = np.uint64(np.asarray(
            torus.int2torus(values[m], out_prec)))
        d = np.abs(np.float64(ph) - np.float64(want))
        assert min(d, 2.0**64 - d) < 2.0**57, m


def test_vertical_packing_big_lut(keys):
    """2^8-entry LUT over N=64: CMUX tree on 2 high bits + BR on 6 low bits
    (`vertical_packing.c:24-52`)."""
    key_trlwe, gk = keys
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    size = 8                            # 256-entry LUT = 4 TRLWEs of N=64
    rng_np = np.random.default_rng(3)
    table = rng_np.integers(0, 16, size=1 << size)
    out_prec = 4
    tv_vals = torus.int2torus(jnp.asarray(table), out_prec).reshape(-1, P.N)
    k0, k1 = jax.random.split(jax.random.PRNGKey(6))
    luts = trlwe.encrypt(tv_vals, key_trlwe, k0)
    for m in (0, 5, 77, 200, 255):
        enc_bits = ll.encrypt_input_bits(m, size, gk,
                                         jax.random.fold_in(k1, m))
        out = ll.eval_lut_vertical(enc_bits, size, luts)
        ph = np.uint64(np.asarray(tlwe.phase(out, key_out)))
        want = np.uint64(np.asarray(
            torus.int2torus(jnp.asarray(int(table[m])), out_prec)))
        d = np.abs(np.float64(ph) - np.float64(want))
        assert min(d, 2.0**64 - d) < 2.0**58, (m, int(table[m]))
