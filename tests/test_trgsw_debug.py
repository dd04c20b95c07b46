"""TRGSW exponent debug-decrypt oracle + API stragglers.

The reference's test technique #4 (SURVEY §4): `_debug_trgsw_decrypt_exp_
sample` / `_DFT_sample` (`trgsw.c:189-268`) isolate exponent errors in
register/GA-style arithmetic-over-exponents schemes.  Also covers
`trgsw_mul_DFT2` (`trgsw.c:433-442`) and `trgsw_ks_b_to_a`
(`trgsw.c:479-483`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import params, trlwe, trgsw, keyswitch as ks

P = params.TOY
KEY = jax.random.PRNGKey(31337)


def setup(seed):
    k0, k1 = jax.random.split(jax.random.fold_in(KEY, seed))
    key_trlwe = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    return key_trlwe, gk, k1


def test_debug_decrypt_exp():
    """TRGSW(X^e) -> e for several exponents, incl. batched."""
    key_trlwe, gk, rk = setup(0)
    for i, e in enumerate([0, 1, 7, P.N - 1]):
        g = trgsw.monomial_encrypt(1, e, gk, jax.random.fold_in(rk, i))
        got = int(trgsw.debug_decrypt_exp(g, gk))
        assert got == e, f"exp {e}: got {got}"


def test_debug_decrypt_exp_dft():
    """NTT-form variant: external product against trivial h*X^0 first
    (`trgsw.c:240-268`)."""
    key_trlwe, gk, rk = setup(1)
    plan = gk.plan()
    for i, e in enumerate([2, 5, P.N // 2]):
        g = trgsw.monomial_encrypt(1, e, gk, jax.random.fold_in(rk, i))
        gd = trgsw.to_dft(g, plan)
        got = int(trgsw.debug_decrypt_exp_dft(gd, gk))
        assert got == e, f"exp {e}: got {got}"


def test_register_exponents_via_oracle():
    """reg_add/reg_sub produce X^(m1±m2) — asserted with the exponent
    oracle instead of end-to-end phase (`register.c:46-71`)."""
    key_trlwe, gk, rk = setup(2)
    m1, m2 = 5, 3
    r1 = trgsw.reg_encrypt(m1, gk, jax.random.fold_in(rk, 0))
    r2 = trgsw.reg_encrypt(m2, gk, jax.random.fold_in(rk, 1))
    radd = trgsw.reg_add(r1, r2)
    rsub = trgsw.reg_sub(r1, r2)
    assert int(trgsw.debug_decrypt_exp_dft(radd.positive, gk)) == m1 + m2
    assert int(trgsw.debug_decrypt_exp_dft(rsub.positive, gk)) == m1 - m2
    # negative registers hold X^(-m) = -X^(N-m): the monomial index
    assert int(trgsw.debug_decrypt_exp_dft(radd.negative, gk)) \
        == P.N - (m1 + m2)


def test_mul_trgsw_dft2():
    """trgsw_mul_DFT2 == trgsw_mul_DFT after the exact NTT round trip."""
    key_trlwe, gk, rk = setup(3)
    plan = gk.plan()
    g1 = trgsw.monomial_encrypt(1, 3, gk, jax.random.fold_in(rk, 0))
    g2 = trgsw.monomial_encrypt(1, 4, gk, jax.random.fold_in(rk, 1))
    g2d = trgsw.to_dft(g2, plan)
    want = trgsw.mul_trgsw_dft(g1, g2d)
    got = trgsw.mul_trgsw_dft2(trgsw.to_dft(g1, plan), g2d)
    np.testing.assert_array_equal(np.asarray(want.v), np.asarray(got.v))
    assert int(trgsw.debug_decrypt_exp_dft(got, gk)) == 7


def test_ks_b_to_a():
    """Rebuild a-side rows from b-side rows; the rebuilt TRGSW still
    evaluates correctly as an external-product operand."""
    key_trlwe, gk, rk = setup(4)
    kk = jax.random.split(rk, 3)
    pair = ks.new_priv_ks_key_pair(kk[0], key_trlwe, key_trlwe,
                                   P.t, P.base_bit)
    e = 6
    g = trgsw.monomial_encrypt(1, e, gk, kk[1])
    # zero out the a-side rows, then restore them from the b side
    rows = g.rows.at[..., :P.l, :, :].set(jnp.uint64(0))
    broken = trgsw.TRGSW(rows=rows, l=P.l, Bg_bit=P.Bg_bit)
    fixed = trgsw.ks_b_to_a(broken, pair)
    assert int(trgsw.debug_decrypt_exp(fixed, gk)) == e
    # and it acts as X^e on a TRLWE via external product
    from mosfhet_tpu import rng as _rng
    msg = _rng.uniform_torus(kk[2], (P.N,))
    c = trlwe.encrypt(msg, key_trlwe, jax.random.fold_in(rk, 9))
    plan = gk.plan()
    out = trgsw.external_product(c, trgsw.to_dft(fixed, plan))
    ph = np.asarray(trlwe.phase(out, key_trlwe), dtype=np.uint64)
    from mosfhet_tpu import polynomial as _poly
    want = np.asarray(_poly.mul_by_xai(msg, e), dtype=np.uint64)
    err = np.abs((ph - want).view(np.int64).astype(np.float64))
    # a-side rows went through the priv-KS (t=8, base=16): ~2^48 noise here
    assert err.max() <= 2.0**50, f"err 2^{np.log2(err.max()+1):.1f}"
