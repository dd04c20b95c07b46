"""Key-switching family tests (`src/keyswitch.c`), TOY params."""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import params, tlwe, trlwe, keyswitch as ks, rng, torus, polynomial

P = params.TOY
KEY = jax.random.PRNGKey(777)


def assert_torus_within(delta, want, got, msg=""):
    diff = np.abs(np.asarray(
        jnp.asarray(got, jnp.uint64) - jnp.asarray(want, jnp.uint64)
    ).view(np.int64).astype(np.float64))
    assert np.all(diff <= delta), f"{msg}: max err 2^{np.log2(diff.max()+1):.1f}"


def setup(seed):
    ksd = jax.random.fold_in(KEY, seed)
    k = jax.random.split(ksd, 6)
    sk = trlwe.new_binary_key(k[0], P.N, P.k, P.rlwe_sigma)
    sk2 = trlwe.new_binary_key(k[1], P.N, P.k, P.rlwe_sigma)
    return sk, sk2, k


def test_trlwe_keyswitch():
    sk, sk2, k = setup(0)
    ksk = ks.new_trlwe_ks_key(k[2], sk, sk2, P.t, P.base_bit)
    m = rng.uniform_torus(k[3], (P.N,))
    c = trlwe.encrypt(m, sk2, k[4])
    out = ks.trlwe_keyswitch(c, ksk)
    assert_torus_within(1 << 48, m, trlwe.phase(out, sk), "trlwe ks")


def test_eval_automorphism():
    """EvalAuto: phase(out) == permute(phase(in)) (`trlwe.c:775-781`)."""
    sk, _, k = setup(1)
    gen = 5
    aks = ks.new_automorphism_ks_keyset(k[2], sk, [gen], P.t, P.base_bit)
    m = rng.uniform_torus(k[3], (P.N,))
    c = trlwe.encrypt(m, sk, k[4])
    out = ks.eval_automorphism(c, gen, aks[gen])
    assert_torus_within(1 << 48, polynomial.permute(m, gen),
                        trlwe.phase(out, sk), "eval auto")


def test_packing1_keyswitch():
    """TLWE(m) -> TRLWE(m * X^0) (`keyswitch.c:368-390,458-475`)."""
    sk, _, k = setup(2)
    tk = trlwe.extract_tlwe_key(sk)
    ksk = ks.new_packing1_ks_key(k[2], sk, tk, P.t, P.base_bit)
    m = rng.uniform_torus(k[3], ())
    c = tlwe.encrypt(m, tk, k[4])
    out = ks.packing1_keyswitch(c, ksk)
    ph = trlwe.phase(out, sk)
    assert_torus_within(1 << 48, m, ph[..., 0], "packing1 coeff 0")


def test_priv_sk_keyswitch():
    """TLWE(m) -> TRLWE(m * -s) (`keyswitch.c:611-656`)."""
    sk, _, k = setup(3)
    tk = trlwe.extract_tlwe_key(sk)
    ksk = ks.new_priv_sk_ks_key(k[2], sk, tk, P.t, P.base_bit)
    m = torus.int2torus(jnp.uint64(1), 2)  # 1/4
    c = tlwe.encrypt(m, tk, k[4])
    out = ks.priv_keyswitch(c, ksk)
    # phase should be ~ m * (-s): check against the cleartext product
    want = (jnp.uint64(0) - sk.s[0].astype(jnp.uint64)) * m
    assert_torus_within(1 << 50, want, trlwe.phase(out, sk), "priv sk ks")


def test_full_packing_keyswitch():
    """n TLWEs -> slots of one TRLWE (`keyswitch.c:99-107,195-227`)."""
    sk, _, k = setup(4)
    tk = trlwe.extract_tlwe_key(sk)
    ksk = ks.new_full_packing_ks_key(k[2], sk, tk, P.t, P.base_bit)
    size = 4
    ms = rng.uniform_torus(k[3], (size,))
    cs = tlwe.encrypt(ms, tk, k[4])
    out = ks.full_packing_keyswitch(cs, size, ksk)
    ph = trlwe.phase(out, sk)
    assert_torus_within(1 << 50, ms, ph[..., :size], "full packing")


def test_lut_packing_keyswitch():
    """torus_base TLWEs -> replicated LUT slots (`keyswitch.c:244-270,
    343-364`)."""
    sk, _, k = setup(5)
    tk = trlwe.extract_tlwe_key(sk)
    tb = 4
    ksk = ks.new_lut_packing_ks_key(k[2], sk, tk, P.t, P.base_bit, tb)
    ms = rng.uniform_torus(k[3], (tb,))
    cs = tlwe.encrypt(ms, tk, k[4])
    out = ks.lut_packing_keyswitch(cs, ksk)
    ph = trlwe.phase(out, sk)
    slot = P.N // tb
    want = jnp.repeat(ms, slot)
    assert_torus_within(1 << 50, want, ph, "lut packing")


def test_cdks21_packing():
    """Trace-based packing TLWE -> TRLWE(m*X^0) (`keyswitch.c:477-546`)."""
    sk, _, k = setup(6)
    tk = trlwe.extract_tlwe_key(sk)
    keys = ks.new_cdks21_packing_keys(k[2], sk, tk, P.t, P.base_bit)
    m = rng.uniform_torus(k[3], ())
    c = tlwe.encrypt(m, tk, k[4])
    out = ks.packing1_keyswitch_cdks21(c, keys)
    ph = trlwe.phase(out, sk)
    # trace multiplies the packed coefficient by N
    want = m * jnp.uint64(P.N)
    assert_torus_within(1 << 54, want, ph[..., 0], "cdks21")


def test_priv_keyswitch_pair():
    """TRLWE(M) -> TRLWE(m*(-s)) via the KS pair (`keyswitch.c:39-63`)."""
    sk, _, k = setup(7)
    m = torus.int2torus(jnp.arange(P.N, dtype=jnp.uint64) % 2, 2)
    pair = ks.new_priv_ks_key_pair(k[2], sk, sk, P.t, P.base_bit)
    c = trlwe.encrypt(m, sk, k[4])
    out = ks.priv_keyswitch_2(c, pair)
    want_poly = polynomial.ntt_mul_small(
        -sk.s[0], trlwe.phase(c, sk), sk.plan())
    assert_torus_within(1 << 52, want_poly, trlwe.phase(out, sk), "priv pair")


def test_tlwe_keyswitch_no_precomp():
    """(`tlwe_keyswitch_no_precomp`, `tlwe.c:305-320`): (base-1)x smaller
    key, scalar multiply at switch time, coarser rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mosfhet_tpu import tlwe, torus
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 4)
    out_key = tlwe.new_binary_key(k0, 32, 0.0)
    in_key = tlwe.new_binary_key(k1, 64, 0.0)
    ksk = tlwe.new_ks_key_no_precomp(k2, out_key, in_key, 6, 4)
    m = torus.double2torus(jnp.arange(8) / 16.0)
    c = tlwe.encrypt(m, in_key, k3)
    o = tlwe.keyswitch_no_precomp(c, ksk)
    ph = np.asarray(tlwe.phase(o, out_key), np.uint64)
    err = np.abs((ph - np.asarray(m, np.uint64)).astype(np.int64))
    assert err.max() < 1 << 45


def test_tlwe_keyswitch_mxu_bit_identical():
    """The MXU (int8-matmul) keyswitch equals keyswitch_no_precomp exactly."""
    import jax
    import jax.numpy as jnp
    from mosfhet_tpu import tlwe, torus
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(21), 4)
    out_key = tlwe.new_binary_key(k0, 24, 2.0**-30)
    in_key = tlwe.new_binary_key(k1, 48, 2.0**-30)
    ksk = tlwe.new_ks_key_no_precomp(k2, out_key, in_key, 5, 3)
    pksk = tlwe.prepare_ks_key_mxu(ksk)
    m = torus.double2torus(jnp.arange(16) / 32.0)
    c = tlwe.encrypt(m, in_key, k3)
    o1 = tlwe.keyswitch_no_precomp(c, ksk)
    o2 = tlwe.keyswitch_mxu(c, pksk)
    assert bool(jnp.all(o1.a == o2.a) & jnp.all(o1.b == o2.b))


def test_seeded_lut_packing_ks_key():
    """Compressed packing key (threefry-seeded masks, the reference's
    USE_COMPRESSED_TRLWE analog) expands to a working LUT-packing key."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mosfhet_tpu import params, tlwe, trlwe, keyswitch, torus
    p = params.TOY
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(77), 4)
    key_trlwe = trlwe.new_binary_key(k0, p.N, p.k, 0.0)
    key_tlwe = trlwe.extract_tlwe_key(key_trlwe)
    tb = 4
    sk = keyswitch.new_lut_packing_ks_key_seeded(
        k1, key_trlwe, key_tlwe, p.t, p.base_bit, tb)
    ksk = keyswitch.expand_lut_packing_ks_key(sk)
    assert sk.b.nbytes < ksk.table.nbytes  # compression is real
    ms = torus.double2torus(jnp.arange(tb) / (2.0 * tb))
    cs = tlwe.encrypt(ms, key_tlwe, k2)
    packed = keyswitch.lut_packing_keyswitch(cs, ksk)
    ph = np.asarray(trlwe.phase(packed, key_trlwe), np.uint64)
    slot = p.N // tb
    want = np.repeat(np.asarray(ms, np.uint64), slot)
    d = np.abs(ph.astype(np.float64) - want.astype(np.float64))
    err = np.minimum(d, 2.0**64 - d).max()
    assert err < 2.0**46, np.log2(err + 1)


def test_tlwe_keyswitch_kernel_bit_identical():
    """Select-sum kernel route == gather path, bit-exact (interpret),
    incl. batch padding."""
    kk = jax.random.split(jax.random.fold_in(KEY, 77), 4)
    out_key = tlwe.new_binary_key(kk[0], 24, 0.0)
    in_key = tlwe.new_binary_key(kk[1], 64, 0.0)
    ksk = tlwe.new_ks_key(kk[2], out_key, in_key, 6, 4)
    m = torus.double2torus(jnp.arange(5) / 16.0)     # batch 5: pad path
    c = tlwe.encrypt(m, in_key, kk[3])
    want = tlwe.keyswitch(c, ksk, impl="jnp")
    got = tlwe.keyswitch(c, ksk, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))


def test_seeded_generic_ks_keys():
    """Seeded packing1/priv-SK keys expand to working dense keys at half
    the footprint (the >HBM mitigation for L2/SET_3 native tables)."""
    P = params.TOY
    kk = jax.random.split(jax.random.fold_in(KEY, 88), 6)
    kr = trlwe.new_binary_key(kk[0], P.N, P.k, 0.0)
    kt = trlwe.extract_tlwe_key(kr)
    sk1 = ks.new_packing1_ks_key_seeded(kk[1], kr, kt, P.t, P.base_bit)
    pk1 = ks.expand_generic_ks_key(sk1)
    m = torus.double2torus(3 / 16.0)
    c = tlwe.encrypt(m, kt, kk[2])
    out = ks.packing1_keyswitch(c, pk1)
    ph = np.asarray(trlwe.phase(out, kr), np.uint64)
    e0 = abs(np.int64(ph[0] - np.uint64(m)).astype(np.float64))
    assert e0 <= 2.0**48, f"packing1 err 2^{np.log2(e0+1):.1f}"
    # priv-SK flavor: TLWE(M) -> TRLWE(m * -s)
    sk2 = ks.new_priv_sk_ks_key_seeded(kk[3], kr, kt, P.t, P.base_bit)
    pk2 = ks.expand_generic_ks_key(sk2)
    assert pk2.include_b
    c2 = tlwe.encrypt(m, kt, kk[4])
    out2 = ks.priv_keyswitch(c2, pk2)
    want = (jnp.uint64(0)
            - polynomial.ntt_mul_small(
                jnp.asarray(kr.s[0], jnp.int32),
                jnp.zeros((P.N,), jnp.uint64).at[0].set(m), kr.plan()))
    e = np.abs((np.asarray(trlwe.phase(out2, kr), np.uint64) -
                np.asarray(want, np.uint64)).view(np.int64)
               .astype(np.float64)).max()
    assert e <= 2.0**50, f"priv-SK err 2^{np.log2(e+1):.1f}"
    # footprint: seeded = (1 + 1/(k+1))... b-only vs full table
    assert sk1.b.nbytes * (P.k + 1) == pk1.table.nbytes


def test_streamed_seeded_gather_bit_identical():
    """Streamed (expand-on-select) apply of seeded packing1/priv-SK/LUT
    packing keys is bit-identical to expanding the table densely first —
    the HBM-relief path for TFHEPP_L2/SET_3 native parameters."""
    kk = jax.random.split(jax.random.fold_in(KEY, 99), 8)
    kr = trlwe.new_binary_key(kk[0], P.N, P.k, 0.0)
    kt = trlwe.extract_tlwe_key(kr)
    m = torus.double2torus(jnp.arange(3) / 16.0)      # batch 3
    c = tlwe.encrypt(m, kt, kk[1])

    sk1 = ks.new_packing1_ks_key_seeded(kk[2], kr, kt, P.t, P.base_bit)
    dense1 = ks.expand_generic_ks_key(sk1)
    o_s = ks.packing1_keyswitch(c, sk1)
    o_d = ks.packing1_keyswitch(c, dense1)
    np.testing.assert_array_equal(np.asarray(o_s.a), np.asarray(o_d.a))
    np.testing.assert_array_equal(np.asarray(o_s.b), np.asarray(o_d.b))

    sk2 = ks.new_priv_sk_ks_key_seeded(kk[3], kr, kt, P.t, P.base_bit)
    dense2 = ks.expand_generic_ks_key(sk2)
    o_s = ks.priv_keyswitch(c, sk2)
    o_d = ks.priv_keyswitch(c, dense2)
    np.testing.assert_array_equal(np.asarray(o_s.a), np.asarray(o_d.a))
    np.testing.assert_array_equal(np.asarray(o_s.b), np.asarray(o_d.b))

    tb = 4
    sk3 = ks.new_lut_packing_ks_key_seeded(kk[4], kr, kt, P.t, P.base_bit,
                                           tb)
    dense3 = ks.expand_lut_packing_ks_key(sk3)
    ms = torus.double2torus(jnp.arange(tb) / (2.0 * tb))
    cs = tlwe.encrypt(ms, kt, kk[5])
    o_s = ks.lut_packing_keyswitch(cs, sk3)
    o_d = ks.lut_packing_keyswitch(cs, dense3)
    np.testing.assert_array_equal(np.asarray(o_s.a), np.asarray(o_d.a))
    np.testing.assert_array_equal(np.asarray(o_s.b), np.asarray(o_d.b))

    # and under jit (trace-time isinstance dispatch)
    o_j = jax.jit(ks.packing1_keyswitch)(c, sk1)
    o_d = ks.packing1_keyswitch(c, dense1)
    np.testing.assert_array_equal(np.asarray(o_j.a), np.asarray(o_d.a))


def test_trlwe_keyswitch_seeded():
    """Seeded multiply-style TRLWE-KS (`SeededTRLWEKSKey`): half the
    stored bytes of the dense key, same keyswitch correctness — the mask
    spectra regenerate from seeds inside the apply (the exact-arithmetic
    equivalent of the reference's DFT-domain compressed samples,
    `trlwe_compressed_vaes.c:88-202`)."""
    sk, sk2, k = setup(7)
    dense = ks.new_trlwe_ks_key(k[2], sk, sk2, P.t, P.base_bit)
    seeded = ks.new_trlwe_ks_key_seeded(k[2], sk, sk2, P.t, P.base_bit)
    dense_bytes = dense.v.nbytes + dense.vs.nbytes
    seeded_bytes = (seeded.seeds.nbytes + seeded.b_v.nbytes
                    + seeded.b_vs.nbytes)
    assert seeded_bytes <= dense_bytes // (sk.k + 1) + seeded.seeds.nbytes
    m = rng.uniform_torus(k[3], (P.N,))
    c = trlwe.encrypt(m, sk2, k[4])
    out = jax.jit(ks.trlwe_keyswitch)(c, seeded)
    assert_torus_within(1 << 48, m, trlwe.phase(out, sk), "seeded ks")


def test_eval_automorphism_seeded_keyset():
    sk, _, k = setup(8)
    gen = 7
    aks = ks.new_automorphism_ks_keyset_seeded(k[2], sk, [gen], P.t,
                                               P.base_bit)
    m = rng.uniform_torus(k[3], (P.N,))
    c = trlwe.encrypt(m, sk, k[4])
    out = ks.eval_automorphism(c, gen, aks[gen])
    assert_torus_within(1 << 48, polynomial.permute(m, gen),
                        trlwe.phase(out, sk), "seeded eval auto")
