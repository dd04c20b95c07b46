"""Tensor products, tlwe_mul, circuit bootstrap, public mux, FDFB, TRGSW
bootstrap, GA bootstrap, seeded samples, io — TOY params.

Mirrors `tests.c`: test_tlwe_mul (:1374), test_trlwe_mul (:1334),
test_circuit_bootstrap (:965), test_public_mux (:1024), test_FDFB_new
(:1095), test_functional_bootstrap_trgsw (:1738), test_functional_
bootstrap_ga (:1615), test_compressed_trlwe (:193), test_io_* (:1868).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import (params, tlwe, trlwe, trgsw, bootstrap, bootstrap_ga,
                         keyswitch as ks, product, seeded, io as mio, rng,
                         torus, polynomial)

P = params.TOY
KEY = jax.random.PRNGKey(4242)


def assert_torus_within(delta, want, got, msg=""):
    diff = np.abs(np.asarray(
        jnp.asarray(got, jnp.uint64) - jnp.asarray(want, jnp.uint64)
    ).view(np.int64).astype(np.float64))
    assert np.all(diff <= delta), f"{msg}: max err 2^{np.log2(diff.max()+1):.1f}"


def test_tensor_prod_exact_and_fft():
    """TRLWE x TRLWE both paths (`trlwe.c:692-771`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 0), 6)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    rlk = ks.new_rl_key(kk[1], sk, 2, 20)
    prec = 4
    m1 = torus.int2torus(jnp.arange(P.N, dtype=jnp.uint64) % 3, prec)
    m2 = jnp.zeros((P.N,), jnp.uint64).at[1].set(torus.int2torus(jnp.uint64(1), prec))
    c1 = trlwe.encrypt(m1, sk, kk[2])
    c2 = trlwe.encrypt(m2, sk, kk[3])
    # expected: (m1 * m2) scaled by 2^(prec) (messages at /2^prec each)
    exp = polynomial.naive_negacyclic_mul(
        torus.torus2int(m1, prec).astype(jnp.uint64),
        torus.torus2int(m2, prec).astype(jnp.uint64))
    want = torus.int2torus(exp, prec)
    for fn in (product.tensor_prod, product.tensor_prod_fft):
        out = fn(c1, c2, prec, rlk)
        assert_torus_within(1 << 56, want, trlwe.phase(out, sk), fn.__name__)


def test_tlwe_mul():
    """(`test_tlwe_mul`, `tests.c:1374-1409`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 1), 6)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    tk = trlwe.extract_tlwe_key(sk)
    rlk = ks.new_rl_key(kk[1], sk, 2, 20)
    ksk = ks.new_packing1_ks_key(kk[2], sk, tk, P.t, P.base_bit)
    prec = 4
    in1, in2 = 5, 11
    c1 = tlwe.encrypt(torus.int2torus(jnp.uint64(in1), prec), tk, kk[3])
    c2 = tlwe.encrypt(torus.int2torus(jnp.uint64(in2), prec), tk, kk[4])
    out = product.tlwe_mul(c1, c2, prec, ksk, rlk)
    res = int(torus.torus2int(tlwe.phase(out, tk), prec)) % (1 << prec)
    assert res == (in1 * in2) % (1 << prec), f"got {res}"


def _bs_keys(seed):
    kk = jax.random.split(jax.random.fold_in(KEY, seed), 8)
    key_tlwe = tlwe.new_binary_key(kk[0], P.n, P.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(kk[1], P.N, P.k, P.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    bk = bootstrap.new_key(kk[2], gk, key_tlwe, 1)
    return kk, key_tlwe, key_trlwe, key_out, gk, bk


def test_circuit_bootstrap_v1_v3():
    """TLWE(bit) -> TRGSW, verified by using the result in a CMUX
    (`circuit_bootstrap{,_3}`, `bootstrap.c:309-366`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(2)
    kska = ks.new_priv_sk_ks_key(kk[3], key_trlwe, key_out, P.t, P.base_bit)
    kskb = ks.new_packing1_ks_key(kk[4], key_trlwe, key_out, P.t, P.base_bit)
    kska_pair = ks.new_priv_ks_key_pair(kk[5], key_trlwe, key_trlwe,
                                        P.t, P.base_bit)
    m0 = rng.uniform_torus(kk[6], (P.N,))
    ctrl = trlwe.encrypt(m0, key_trlwe, kk[7])
    for bit in (0, 1):
        # reference encodes LWE(bit/4) for torus_base=2 (`tests.c:980,998`)
        c = tlwe.encrypt(torus.double2torus(bit / 4.0), key_tlwe,
                         jax.random.fold_in(KEY, 90 + bit))
        g1 = bootstrap.circuit_bootstrap(c, bk, kska, kskb, P.l, P.Bg_bit)
        g3 = bootstrap.circuit_bootstrap_3(c, bk, kska_pair, kskb,
                                           P.l, P.Bg_bit)
        for name, g in (("v1", g1), ("v3", g3)):
            gd = trgsw.to_dft(g, gk.plan())
            out = trgsw.external_product(ctrl, gd)
            want = m0 if bit else jnp.zeros_like(m0)
            assert_torus_within(1 << 59, want, trlwe.phase(out, key_trlwe),
                                f"CB {name} bit={bit}")


def test_public_mux():
    """(`test_public_mux`, `tests.c:1024-1056`): selector TRLWE(0/1) picks
    p0 or p1."""
    kk = jax.random.split(jax.random.fold_in(KEY, 3), 6)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    plan = sk.plan()
    p0 = rng.uniform_torus(kk[1], (P.N,))
    p1 = rng.uniform_torus(kk[2], (P.N,))
    for bit in (0, 1):
        # selector rows: TRLWE(bit * h_i) for each level
        rows = []
        for i in range(P.l):
            h = jnp.uint64(bit) << jnp.uint64(64 - (i + 1) * P.Bg_bit)
            m = jnp.zeros((P.N,), jnp.uint64).at[0].set(h)
            rows.append(trlwe.encrypt(m, sk, jax.random.fold_in(kk[3], i)))
        sel_v = jnp.stack([
            jnp.asarray(trlwe.to_dft(r, plan).v) for r in rows], axis=-4)
        out = bootstrap.public_mux(p0, p1, sel_v, P.l, P.Bg_bit, P.k, P.N,
                                   plan.primes)
        want = p1 if bit else p0
        assert_torus_within(1 << 56, want, trlwe.phase(out, sk),
                            f"public_mux bit={bit}")


def test_fdfb_this_work():
    """Full-domain bootstrap, `full_domain_functional_bootstrap`
    (`bootstrap.c:519-538`, test `tests.c:1095-1127`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(4)
    tksk = tlwe.new_ks_key(kk[3], key_tlwe, key_out, P.t, P.base_bit)
    prec = 3
    luts = rng.uniform_torus(kk[4], (8,))
    tv = trlwe.torus_packing_many_lut(luts, 4, 2, P.k, P.N)
    for m in range(8):
        c = tlwe.encrypt(torus.int2torus(jnp.uint64(m), 3), key_tlwe,
                         jax.random.fold_in(KEY, 70 + m))
        out = bootstrap.fdfb_this_work(tv, c, bk, tksk, prec)
        assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out),
                            f"fdfb m={m}")


def test_fdfb_ks21():
    """(`test_FDFB_KS21`, `tests.c:1058-1093`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(9)
    ksk = ks.new_packing1_ks_key(kk[3], key_trlwe, key_out, 6, 4)
    luts = rng.uniform_torus(kk[4], (8,))
    tvp = jnp.repeat(luts, (2 * P.N) // 8)
    for m in (0, 3, 5):
        c = tlwe.encrypt(torus.int2torus(jnp.uint64(m), 3), key_tlwe,
                         jax.random.fold_in(KEY, 75 + m))
        out = bootstrap.fdfb_ks21(tvp, c, bk, ksk, 8)
        assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out),
                            f"fdfb_ks21 m={m}")


def test_fdfb_clot21():
    """(`test_FDFB_CLOT21`, `tests.c:1129-1177`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(10)
    rlk = ks.new_rl_key(kk[3], key_trlwe, 2, 20)
    ksk = ks.new_packing1_ks_key(kk[4], key_trlwe, key_out, P.t, P.base_bit)
    prec = 4
    luts = torus.int2torus(
        rng.uniform_torus(kk[5], (8,)) & jnp.uint64((1 << prec) - 1), prec)
    tv0 = trlwe.torus_packing(luts[:4], P.k, P.N)
    tv1 = trlwe.torus_packing(luts[4:], P.k, P.N)
    for m in (1, 6):
        c = tlwe.encrypt(torus.int2torus(jnp.uint64(m), 3), key_tlwe,
                         jax.random.fold_in(KEY, 85 + m))
        out = bootstrap.fdfb_clot21(tv0, tv1, c, bk, ksk, rlk, prec)
        assert_torus_within(1 << (64 - prec - 1), luts[m],
                            tlwe.phase(out, key_out), f"fdfb_clot21 m={m}")


def test_trgsw_bootstrap():
    """TRGSW-accumulator bootstrap phases (`bootstrap.c:267-306`,
    test `tests.c:1738`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(5)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P.k, P.N)
    m = 2
    c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                     jax.random.fold_in(KEY, 95))
    g = bootstrap.functional_bootstrap_trgsw_phase1(c, bk, 4, P.l, P.Bg_bit)
    out = bootstrap.functional_bootstrap_trgsw_phase2(g, tv)
    assert_torus_within(1 << 59, luts[m], tlwe.phase(out, key_out), "trgsw bs")


def test_functional_bootstrap_ga():
    """Galois-automorphism blind rotate (`bootstrap_ga.c`, test
    `tests.c:1615`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 6), 4)
    key_tlwe = tlwe.new_binary_key(kk[0], P.n, P.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(kk[1], P.N, P.k, P.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    bk = bootstrap_ga.new_key(kk[2], gk, key_tlwe)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P.k, P.N)
    for m in (1, 3):
        c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                         jax.random.fold_in(KEY, 96 + m))
        out = bootstrap_ga.functional_bootstrap_ga(tv, c, bk, 4)
        assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out),
                            f"GA bs m={m}")


def test_seeded_trlwe():
    """Compressed samples expand/subto (`trlwe_compressed.c`,
    test `tests.c:193-229`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 7), 5)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    m1 = rng.uniform_torus(kk[1], (P.N,))
    m2 = rng.uniform_torus(kk[2], (P.N,))
    c1 = trlwe.encrypt(m1, sk, kk[3])
    s2 = seeded.encrypt(m2, sk, kk[4])
    assert_torus_within(1 << 44, m2, trlwe.phase(seeded.expand(s2), sk),
                        "seeded decrypt")
    out = seeded.subto(c1, s2)
    assert_torus_within(1 << 44, m1 - m2, trlwe.phase(out, sk), "seeded subto")


def test_io_roundtrip(tmp_path):
    """Native save/load for keys and ciphertexts (`tests.c:1868-2006`
    analog, byte-exact array equality)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 8), 6)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    tk = trlwe.extract_tlwe_key(sk)
    gk = trgsw.new_key(sk, P.l, P.Bg_bit)
    m = rng.uniform_torus(kk[1], (P.N,))
    c = trlwe.encrypt(m, sk, kk[2])
    g = trgsw.to_dft(trgsw.monomial_encrypt(1, 3, gk, kk[3]), gk.plan())
    ksk = ks.new_trlwe_ks_key(kk[4], sk, sk, P.t, P.base_bit)
    sksk = ks.new_trlwe_ks_key_seeded(kk[5], sk, sk, P.t, P.base_bit)
    for name, obj in (("sk", sk), ("tk", tk), ("c", c), ("g", g),
                      ("ksk", ksk), ("sksk", sksk)):
        path = tmp_path / f"{name}.mtpu"
        mio.save(path, obj)
        back = mio.load(path)
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(obj),
                                  jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_b))


def test_mosfhet_import(tmp_path):
    """Import the reference's raw binary layouts (synthesized here with the
    same struct packing as `tlwe.c:43-99`)."""
    import struct
    n = 8
    s = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint64)
    a = np.arange(n, dtype=np.uint64) * np.uint64(2**60 + 7)
    b = np.uint64(123456789)
    raw = struct.pack("<i", n) + struct.pack("<d", 2.0**-15) + s.tobytes()
    raw += a.tobytes() + b.tobytes()
    p = tmp_path / "ref.bin"
    p.write_bytes(raw)
    with open(p, "rb") as f:
        key = mio.import_mosfhet_tlwe_key(f)
        c = mio.import_mosfhet_tlwe(f, n)
    np.testing.assert_array_equal(np.asarray(key.s), s.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(c.a), a)
    assert int(c.b) == int(b)


def test_circuit_bootstrap_v2():
    """Single many-LUT bootstrap variant (`circuit_bootstrap_2`,
    `bootstrap.c:324-344`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(12)
    kska = ks.new_priv_sk_ks_key(kk[3], key_trlwe, key_out, P.t, P.base_bit)
    kskb = ks.new_packing1_ks_key(kk[4], key_trlwe, key_out, P.t, P.base_bit)
    m0 = rng.uniform_torus(kk[5], (P.N,))
    ctrl = trlwe.encrypt(m0, key_trlwe, kk[6])
    for bit in (0, 1):
        c = tlwe.encrypt(torus.double2torus(bit / 4.0), key_tlwe,
                         jax.random.fold_in(KEY, 120 + bit))
        g = bootstrap.circuit_bootstrap_2(c, bk, kska, kskb, P.l, P.Bg_bit)
        gd = trgsw.to_dft(g, gk.plan())
        out = trgsw.external_product(ctrl, gd)
        want = m0 if bit else jnp.zeros_like(m0)
        assert_torus_within(1 << 59, want, trlwe.phase(out, key_trlwe),
                            f"CB v2 bit={bit}")


def test_fdfb_clot21_single_br():
    """Single-blind-rotate CLOT21 FDFB (`bootstrap.c:483-517`)."""
    kk, key_tlwe, key_trlwe, key_out, gk, bk = _bs_keys(13)
    rlk = ks.new_rl_key(kk[3], key_trlwe, 2, 20)
    ksk = ks.new_packing1_ks_key(kk[4], key_trlwe, key_out, P.t, P.base_bit)
    prec = 4
    luts = torus.int2torus(
        rng.uniform_torus(kk[5], (8,)) & jnp.uint64((1 << prec) - 1), prec)
    for m in (1, 6):
        c = tlwe.encrypt(torus.int2torus(jnp.uint64(m), 3), key_tlwe,
                         jax.random.fold_in(KEY, 130 + m))
        out = bootstrap.fdfb_clot21_2(luts, c, bk, ksk, rlk, prec)
        assert_torus_within(1 << (64 - prec - 1), luts[m],
                            tlwe.phase(out, key_out), f"fdfb_clot21_2 m={m}")


def test_trgsw_registers():
    """X^(m1±m2) register arithmetic (`register.c:46-71`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 14), 4)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, P.rlwe_sigma)
    gk_ = trgsw.new_key(sk, P.l, P.Bg_bit)
    r1 = trgsw.reg_encrypt(5, gk_, kk[1])
    r2 = trgsw.reg_encrypt(3, gk_, kk[2])
    m0 = rng.uniform_torus(kk[3], (P.N,))
    ctrl = trlwe.encrypt(m0, sk, jax.random.fold_in(KEY, 140))
    for name, r, e in (("add", trgsw.reg_add(r1, r2), 8),
                       ("sub", trgsw.reg_sub(r1, r2), 2)):
        out = trgsw.external_product(ctrl, trgsw._with_shoup(r.positive))
        want = polynomial.mul_by_xai(m0, jnp.int32(e))
        assert_torus_within(1 << 60, want, trlwe.phase(out, sk),
                            f"reg {name}")


def test_mv_extract_variants():
    """Multi-value extraction (`trlwe_mv_extract_tlwe*`, `trlwe.c:580-620`)."""
    kk = jax.random.split(jax.random.fold_in(KEY, 15), 3)
    sk = trlwe.new_binary_key(kk[0], P.N, P.k, 0.0)
    key_out = trlwe.extract_tlwe_key(sk)
    m0 = rng.uniform_torus(kk[1], (P.N,))
    c = trlwe.encrypt(m0, sk, kk[2])
    amount = 4
    outs = trlwe.mv_extract_tlwe(c, amount)
    m_np = np.asarray(m0, np.uint64)
    for i, o in enumerate(outs):
        if i < amount // 2:
            want = m_np[i]
        else:
            want = np.uint64(0) - m_np[P.N - 1 - (i - amount // 2)]
        assert_torus_within(1 << 46, want, tlwe.phase(o, key_out),
                            f"mv extract {i}")
