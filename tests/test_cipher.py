"""TLWE/TRLWE/TRGSW tests — phase-within-delta asserts like the reference
(`tests.c:122-328`), on TOY parameters for speed (noise budgets scale)."""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import params, tlwe, trlwe, trgsw, rng, torus

P = params.TOY
KEY = jax.random.PRNGKey(1234)
M64 = 1 << 64


def keys(i=0):
    return jax.random.fold_in(KEY, i)


def assert_torus_within(delta, want, got, msg=""):
    want = np.asarray(want, dtype=np.uint64)
    got = np.asarray(got, dtype=np.uint64)
    diff = (got - want).view(np.int64) if hasattr(got - want, "view") else got - want
    diff = np.abs(np.asarray(got - want).view(np.int64).astype(np.float64))
    assert np.all(diff <= delta), f"{msg}: max err 2^{np.log2(diff.max()+1):.1f}"


def test_tlwe_encrypt_decrypt_linear():
    k0, k1, k2, k3 = jax.random.split(keys(0), 4)
    sk = tlwe.new_binary_key(k0, P.n, P.lwe_sigma)
    m1 = rng.uniform_torus(k1, (5,))
    m2 = rng.uniform_torus(k2, (5,))
    c1 = tlwe.encrypt(m1, sk, k3)
    assert_torus_within(1 << 44, m1, tlwe.phase(c1, sk), "TLWE decrypt")
    c2 = tlwe.encrypt(m2, sk, jax.random.fold_in(k3, 1))
    assert_torus_within(1 << 44, m1 + m2, tlwe.phase(tlwe.add(c1, c2), sk), "add")
    assert_torus_within(1 << 44, m1 - m2, tlwe.phase(tlwe.sub(c1, c2), sk), "sub")
    assert_torus_within(1 << 44, jnp.uint64(0) - m1, tlwe.phase(tlwe.neg(c1), sk), "neg")
    tri = tlwe.noiseless_trivial(m1, P.n)
    np.testing.assert_array_equal(np.asarray(tlwe.phase(tri, sk)), np.asarray(m1))


def test_tlwe_many_additions():
    """10000 accumulated samples stay within 2^58 (`tests.c:140-150`),
    shrunk to 1000 for CI."""
    k0, k1, k2 = jax.random.split(keys(1), 3)
    sk = tlwe.new_binary_key(k0, P.n, P.lwe_sigma)
    ms = rng.uniform_torus(k1, (1000,))
    cs = tlwe.encrypt(ms, sk, k2)
    acc = tlwe.TLWE(a=jnp.sum(cs.a, axis=0, dtype=jnp.uint64),
                    b=jnp.sum(cs.b, axis=0, dtype=jnp.uint64))
    want = jnp.sum(ms, dtype=jnp.uint64)
    assert_torus_within(1 << 52, want, tlwe.phase(acc, sk), "1000 adds")


def test_trlwe_encrypt_decrypt_linear():
    k0, k1, k2, k3 = jax.random.split(keys(2), 4)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    m1 = rng.uniform_torus(k1, (P.N,))
    m2 = rng.uniform_torus(k2, (P.N,))
    c1 = trlwe.encrypt(m1, sk, k3)
    assert_torus_within(1 << 44, m1, trlwe.phase(c1, sk), "TRLWE decrypt")
    c2 = trlwe.encrypt(m2, sk, jax.random.fold_in(k3, 1))
    assert_torus_within(1 << 44, m1 + m2, trlwe.phase(trlwe.add(c1, c2), sk))
    assert_torus_within(1 << 44, m1 - m2, trlwe.phase(trlwe.sub(c1, c2), sk))


def test_trlwe_dft_phase_roundtrip():
    """to_dft/from_dft are exact; dft_phase == phase (`trlwe.c:372-382`)."""
    k0, k1, k3 = jax.random.split(keys(3), 3)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    m = rng.uniform_torus(k1, (P.N,))
    c = trlwe.encrypt(m, sk, k3)
    cd = trlwe.to_dft(c, sk.plan())
    back = trlwe.from_dft(cd)
    np.testing.assert_array_equal(np.asarray(back.b), np.asarray(c.b))
    np.testing.assert_array_equal(np.asarray(back.a), np.asarray(c.a))
    np.testing.assert_array_equal(
        np.asarray(trlwe.dft_phase(cd, sk)), np.asarray(trlwe.phase(c, sk)))


def test_trlwe_mul_by_xai_phase():
    """Rotating a ciphertext rotates its phase."""
    k0, k1, k3 = jax.random.split(keys(4), 3)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    m = rng.uniform_torus(k1, (P.N,))
    c = trlwe.encrypt(m, sk, k3)
    from mosfhet_tpu import polynomial
    rot = trlwe.mul_by_xai(c, 5)
    assert_torus_within(1 << 44, polynomial.mul_by_xai(m, 5),
                        trlwe.phase(rot, sk), "xai rotate")


def test_extract_tlwe():
    """Extracted TLWE decrypts to the idx-th phase coefficient
    (`trlwe_extract_tlwe`, `trlwe.c:540-552`)."""
    k0, k1, k3 = jax.random.split(keys(5), 3)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    sk_out = trlwe.extract_tlwe_key(sk)
    m = rng.uniform_torus(k1, (P.N,))
    c = trlwe.encrypt(m, sk, k3)
    for idx in (0, 1, P.N - 1, 7):
        e = trlwe.extract_tlwe(c, idx)
        assert_torus_within(1 << 44, m[idx], tlwe.phase(e, sk_out), f"idx={idx}")


def test_extract_tlwe_k2():
    P2 = params.TOY_K2
    k0, k1, k3 = jax.random.split(keys(6), 3)
    sk = trlwe.new_binary_key(k0, P2.N, P2.k, P2.rlwe_sigma)
    sk_out = trlwe.extract_tlwe_key(sk)
    m = rng.uniform_torus(k1, (P2.N,))
    c = trlwe.encrypt(m, sk, k3)
    e = trlwe.extract_tlwe(c, 3)
    assert_torus_within(1 << 44, m[3], tlwe.phase(e, sk_out), "k=2 extract")


def test_trgsw_exp_encrypt_decrypt():
    """TRGSW(X^e): the unique above-threshold phase coefficient of the l-th
    row recovers e (`_debug_trgsw_decrypt_exp_sample`, `trgsw.c:189-216`)."""
    k0, k3 = jax.random.split(keys(7), 2)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(sk, P.l, P.Bg_bit)
    e = 13
    g = trgsw.monomial_encrypt(1, e, gk, k3)
    # row l (first row of component k=1, encrypting 1*h_0 at b)
    row = trlwe.TRLWE(a=g.rows[P.k * P.l, :P.k, :], b=g.rows[P.k * P.l, P.k, :])
    ph = np.asarray(trlwe.phase(row, sk)).view(np.int64)
    delta = 1 << (64 - 1 - P.Bg_bit)
    hits = np.nonzero(np.abs(ph) > delta)[0]
    assert list(hits) == [e], f"exp decrypt found {hits}"


def test_external_product_rotates():
    """TRGSW(X^e) (x) TRLWE(m) ~= TRLWE(m * X^e) — the leveled-LUT core
    (`applications/leveled_lut/main.c`)."""
    from mosfhet_tpu import polynomial
    k0, k1, k2, k3 = jax.random.split(keys(8), 4)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(sk, P.l, P.Bg_bit)
    e = 9
    gd = trgsw.to_dft(trgsw.monomial_encrypt(1, e, gk, k2), gk.plan())
    m = rng.uniform_torus(k1, (P.N,)) >> jnp.uint64(40)  # small messages
    m = m << jnp.uint64(40)
    c = trlwe.encrypt(m, sk, k3)
    out = trgsw.external_product(c, gd)
    want = polynomial.mul_by_xai(m, e)
    assert_torus_within(1 << 40, want, trlwe.phase(out, sk), "external product")


def test_external_product_batched():
    """Leading batch axes broadcast through the fused kernel."""
    k0, k1, k2, k3 = jax.random.split(keys(9), 4)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(sk, P.l, P.Bg_bit)
    gd = trgsw.to_dft(trgsw.monomial_encrypt(1, 3, gk, k2), gk.plan())
    m = rng.uniform_torus(k1, (4, P.N))
    c = trlwe.encrypt(m, sk, k3)
    out = trgsw.external_product(c, gd)
    assert out.b.shape == (4, P.N)
    from mosfhet_tpu import polynomial
    want = polynomial.mul_by_xai(m, 3)
    assert_torus_within(1 << 40, want, trlwe.phase(out, sk), "batched ext prod")


def test_trgsw_mul_trgsw():
    """TRGSW(X^a) x TRGSW(X^b) = TRGSW(X^(a+b)) (`trgsw_mul_DFT`)."""
    k0, k2, k3 = jax.random.split(keys(10), 3)
    sk = trlwe.new_binary_key(k0, P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(sk, P.l, P.Bg_bit)
    g1 = trgsw.monomial_encrypt(1, 4, gk, k2)
    g2d = trgsw.to_dft(trgsw.monomial_encrypt(1, 5, gk, k3), gk.plan())
    prod = trgsw.from_dft(trgsw.mul_trgsw_dft(g1, g2d))
    row = trlwe.TRLWE(a=prod.rows[P.k * P.l, :P.k, :],
                      b=prod.rows[P.k * P.l, P.k, :])
    ph = np.asarray(trlwe.phase(row, sk)).view(np.int64)
    delta = 1 << (64 - 2 - P.Bg_bit)
    hits = np.nonzero(np.abs(ph) > delta)[0]
    assert list(hits) == [9], f"TRGSW mul found {hits}"


def test_tlwe_keyswitch():
    """k*N -> n key switch (`tlwe_keyswitch`, `tlwe.c:289-303`)."""
    k0, k1, k2, k3, k4 = jax.random.split(keys(11), 5)
    sk_big = tlwe.new_binary_key(k0, P.k * P.N, P.rlwe_sigma)
    sk_small = tlwe.new_binary_key(k1, P.n, P.lwe_sigma)
    ksk = tlwe.new_ks_key(k2, sk_small, sk_big, P.t, P.base_bit)
    m = rng.uniform_torus(k3, (3,))
    c = tlwe.encrypt(m, sk_big, k4)
    out = tlwe.keyswitch(c, ksk)
    assert out.a.shape == (3, P.n)
    assert_torus_within(1 << 48, m, tlwe.phase(out, sk_small), "keyswitch")
