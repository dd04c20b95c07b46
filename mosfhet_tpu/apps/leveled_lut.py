"""Leveled LUT evaluation examples (`applications/leveled_lut/`).

- `LeveledLUT`: encrypt the input as TRGSW(X^(2N-m)); one external product
  per lookup (`main.c:7-29`).
- `VerticalPackingLUT`: CGGI20 big-LUT — encrypt the input bit-by-bit as
  TRGSW(bit), CMUX-tree over the high bits, blind-rotate with powers-of-two
  exponents over the low log2(N) bits (`vertical_packing.c:24-52`).

Both batched over leading axes (one encrypted input per batch element).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import trgsw as _trgsw
from .. import trlwe as _trlwe
from ..tlwe import TLWE
from ..trgsw import TRGSWDFT, TRGSWKey
from ..trlwe import TRLWE
from ..torus import TORUS_DTYPE, int2torus, torus2int


def encrypt_input(m: int, key: TRGSWKey, rkey) -> TRGSWDFT:
    """TRGSW(X^(2N - m)) (`main.c:7-17`)."""
    N = key.trlwe_key.N
    g = _trgsw.monomial_encrypt(1, 2 * N - m, key, rkey)
    return _trgsw.to_dft(g, key.plan())


def encrypt_lut(values, out_prec: int, key, rkey) -> TRLWE:
    """TRLWE encryption of a cleartext integer LUT (`main.c:60-66`)."""
    m = int2torus(jnp.asarray(values, TORUS_DTYPE), out_prec)
    return _trlwe.encrypt(m, key, rkey)


def eval_lut(enc_input: TRGSWDFT, enc_lut: TRLWE) -> TLWE:
    """One external product + extract (`main.c:19-29`)."""
    out = _trgsw.external_product(enc_lut, enc_input)
    return _trlwe.extract_tlwe(out, 0)


# --- CGGI20 vertical packing -------------------------------------------------

def encrypt_input_bits(m: int, size: int, key: TRGSWKey, rkey) -> TRGSWDFT:
    """TRGSW(bit_i(m)) for i < size, stacked on a leading axis
    (`vertical_packing.c:8-23`)."""
    bits = jnp.asarray([(m >> i) & 1 for i in range(size)], jnp.int64)
    from ..bootstrap import _batched_monomial_encrypt
    g = _batched_monomial_encrypt(
        bits, jnp.zeros((size,), jnp.int32), key, rkey)
    return _trgsw.to_dft(g, key.plan())


def cmux(c0: TRLWE, c1: TRLWE, selector: TRGSWDFT) -> TRLWE:
    """out = c0 + selector (x) (c1 - c0) (`vertical_packing.c:25-35`)."""
    diff = _trlwe.sub(c1, c0)
    return _trlwe.add(_trgsw.external_product(diff, selector), c0)


def _select_dft(g: TRGSWDFT, i: int) -> TRGSWDFT:
    return TRGSWDFT(v=g.v[i], vs=g.vs[i] if g.vs is not None else None,
                    l=g.l, Bg_bit=g.Bg_bit, primes=g.primes)


def eval_lut_vertical(enc_bits: TRGSWDFT, size: int, luts: TRLWE) -> TLWE:
    """CMUX tree over high bits, blind rotate over the low log2(N) bits with
    powers-of-two exponents (`vertical_packing.c:38-53`).

    luts: TRLWE with leading axis [n_luts = 2^size / N]."""
    from .. import bootstrap as _bs
    N = luts.N
    log_N = int(math.log2(N))
    cur = luts
    for i in range(size - log_N):
        half = 1 << (size - log_N - i - 1)
        sel = _select_dft(enc_bits, size - i - 1)
        lo = TRLWE(a=cur.a[:half], b=cur.b[:half])
        hi = TRLWE(a=cur.a[half:2 * half], b=cur.b[half:2 * half])
        cur = cmux(lo, hi, sel)
    acc = TRLWE(a=cur.a[0], b=cur.b[0]) if cur.b.ndim > 1 else cur
    # blind rotate by sum of bit_i * 2^i: a_i = (2N - 2^i) / 2N on the torus
    n_bits = min(size, log_N)
    a = jnp.stack([int2torus(TORUS_DTYPE(2 * N - (1 << i)), log_N + 1)
                   for i in range(n_bits)])
    bkv = enc_bits.v[:n_bits]
    bkvs = enc_bits.vs[:n_bits]
    from ..bootstrap import BootstrapKey
    bk = BootstrapKey(v=bkv, vs=bkvs, su=None, n=n_bits, k=acc.k, N=N,
                      l=enc_bits.l, Bg_bit=enc_bits.Bg_bit, unfolding=1,
                      primes=enc_bits.primes)
    rot = _bs.blind_rotate(acc, a, bk)
    return _trlwe.extract_tlwe(rot, 0)
