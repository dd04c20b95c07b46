"""Ciphertext-by-ciphertext multiplication: TRLWE tensor products (BFV-like)
with relinearization, and TLWE x TLWE on top (`trlwe.c:692-771`,
`tlwe.c:322-332`).

Two flavors, like the reference:
- `tensor_prod`     : exact wide products (the reference's 128-bit Karatsuba
                      path, `fft/karatsuba.c`) via the wide-prime CRT-NTT and
                      the mod-2^128 shifted readback.
- `tensor_prod_fft` : half-precision pre-scaling then single-width products
                      (`trlwe_tensor_prod_FFT`, `trlwe.c:727-771`) — here the
                      products are still *exact*; only the pre-scaling
                      truncation loses precision, exactly as in the
                      reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import ntt as _ntt
from . import polynomial as _poly
from . import trlwe as _trlwe
from . import keyswitch as _ks
from .tlwe import TLWE
from .trlwe import TRLWE
from .torus import TORUS_DTYPE, TORUS_BITS


def tensor_prod(c1: TRLWE, c2: TRLWE, precision: int,
                rl_key: _ks.TRLWEKSKey) -> TRLWE:
    """Exact tensor product + relinearization (`trlwe_tensor_prod`,
    `trlwe.c:692-712`).  k must be 1."""
    assert c1.k == 1 and c2.k == 1
    bit_scale = TORUS_BITS - precision
    a1, b1 = c1.a[..., 0, :], c1.b
    a2, b2 = c2.a[..., 0, :], c2.b
    t_a = _poly.full_mul_with_scale(a1, a2, bit_scale)
    out_a = (_poly.full_mul_with_scale(a1, b2, bit_scale)
             + _poly.full_mul_with_scale(b1, a2, bit_scale))
    out_b = _poly.full_mul_with_scale(b1, b2, bit_scale)
    t = TRLWE(a=t_a[..., None, :], b=jnp.zeros_like(t_a))
    t = _ks.trlwe_keyswitch(t, rl_key)
    return _trlwe.sub(TRLWE(a=out_a[..., None, :], b=out_b), t)


def tensor_prod_fft(c1: TRLWE, c2: TRLWE, precision: int,
                    rl_key: _ks.TRLWEKSKey) -> TRLWE:
    """Half-precision pre-scaled tensor product (`trlwe_tensor_prod_FFT`,
    `trlwe.c:727-771`).

    Operands are rounded to half_prec{1,2} integer bits; the subsequent
    products are computed exactly by the NTT (the reference incurs extra FFT
    error here; we do not)."""
    assert c1.k == 1 and c2.k == 1
    N = c1.N
    half_prec1 = TORUS_BITS - (TORUS_BITS - precision) // 2
    half_prec2 = TORUS_BITS - (TORUS_BITS - precision + 1) // 2
    # integer magnitudes ~2^half_prec; conv bound N * 2^(h1+h2)
    bound = N << (half_prec1 + half_prec2)
    plan = _ntt.get_plan(N, _ntt.primes_for_bound(bound, N))

    def scaled_ntt(x, log_scale):
        xs = _poly.torus_scale_round(x, log_scale)
        return _ntt.to_ntt_u64(xs, plan)

    A1 = scaled_ntt(c1.a[..., 0, :], half_prec1)
    A2 = scaled_ntt(c2.a[..., 0, :], half_prec2)
    B1 = scaled_ntt(c1.b, half_prec1)
    B2 = scaled_ntt(c2.b, half_prec2)

    t_a = _ntt.from_ntt_u64(_ntt.pointwise_mul(A1, A2, plan), plan)
    out_a = _ntt.from_ntt_u64(
        _ntt.add(_ntt.pointwise_mul(A1, B2, plan),
                 _ntt.pointwise_mul(B1, A2, plan), plan), plan)
    out_b = _ntt.from_ntt_u64(_ntt.pointwise_mul(B1, B2, plan), plan)

    t = TRLWE(a=t_a[..., None, :], b=jnp.zeros_like(t_a))
    t = _ks.trlwe_keyswitch(t, rl_key)
    return _trlwe.sub(TRLWE(a=out_a[..., None, :], b=out_b), t)


def tlwe_mul(c1: TLWE, c2: TLWE, precision: int, ksk: _ks.GenericKSKey,
             rlk: _ks.TRLWEKSKey) -> TLWE:
    """TLWE x TLWE via packing1-KS + tensor product + extract
    (`tlwe_mul`, `tlwe.c:322-332`)."""
    t1 = _ks.packing1_keyswitch(c1, ksk)
    t2 = _ks.packing1_keyswitch(c2, ksk)
    prod = tensor_prod_fft(t1, t2, precision, rlk)
    return _trlwe.extract_tlwe(prod, 0)
