"""TORUS32 correctness suite — run in a fresh interpreter with
MOSFHET_TORUS_BITS=32 (see test_torus32.py).  Not collected directly
(leading underscore): the torus width is fixed at import."""

import os

assert os.environ.get("MOSFHET_TORUS_BITS") == "32"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge
    xla_bridge._clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mosfhet_tpu import (params, tlwe, trlwe, trgsw, bootstrap, keyswitch,
                         rng, torus, polynomial, ntt)

P32 = params.TFHEParams(n=16, N=64, k=1, l=3, Bg_bit=7, t=5, base_bit=4,
                        lwe_sigma=2.0**-20, rlwe_sigma=2.0**-25, name="T32")


def _err(ph, want):
    d = np.abs(np.asarray(ph).astype(np.int64)
               - np.asarray(want).astype(np.int64))
    return np.minimum(d, (1 << 32) - d).max()


def test_dtype():
    assert torus.TORUS_BITS == 32
    assert torus.TORUS_DTYPE == jnp.uint32


def test_exact_poly_mult():
    N = 64
    a = rng.uniform_torus(jax.random.PRNGKey(2), (N,))
    d = jnp.arange(-8, 56, dtype=jnp.int32) % 17 - 8
    want = polynomial.naive_negacyclic_mul(
        d.astype(jnp.int64).astype(torus.TORUS_DTYPE), a)
    plan = ntt.get_plan(N, ntt.primes_for_bound(ntt.conv_bound(N, 16, 1)))
    got = polynomial.ntt_mul_small(d, a, plan)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert got.dtype == jnp.uint32


def test_trlwe_roundtrip():
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    key = trlwe.new_binary_key(k0, 64, 1, 2.0**-25)
    m = torus.double2torus(jnp.arange(64) / 128.0)
    c = trlwe.encrypt(m, key, k1)
    assert _err(trlwe.phase(c, key), m) < 1 << 10


def test_bootstrap():
    p = P32
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 5)
    kt = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, kt, 1)
    luts = rng.uniform_torus(k3, (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    B = 8
    ms = torus.double2torus(jnp.arange(B) % 4 / 8.0)
    cs = tlwe.encrypt(ms, kt, k4)
    out = bootstrap.functional_bootstrap(tv, cs, bk, 4)
    want = np.asarray(luts)[np.arange(B) % 4]
    assert _err(tlwe.phase(out, ko), want) < 1 << 26


def test_tlwe_keyswitch():
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 4)
    out_key = tlwe.new_binary_key(k0, 32, 0.0)
    in_key = tlwe.new_binary_key(k1, 64, 0.0)
    ksk = tlwe.new_ks_key(k2, out_key, in_key, 5, 4)
    m = torus.double2torus(jnp.arange(8) / 16.0)
    c = tlwe.encrypt(m, in_key, k3)
    o = tlwe.keyswitch(c, ksk)
    assert _err(tlwe.phase(o, out_key), m) < 1 << 14


def test_pallas_step_kernel_torus32():
    """Single-limb kernel scan == jnp blind rotate, bit-exact (interpret)."""
    import math
    from mosfhet_tpu.ops import pbs_kernel as pk
    from mosfhet_tpu import bootstrap as _bs

    p = P32
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(17), 5)
    kt = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, kt, 1)
    B = 32
    luts = rng.uniform_torus(k3, (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    tv_b = trlwe.TRLWE(a=jnp.broadcast_to(tv.a, (B,) + tv.a.shape),
                       b=jnp.broadcast_to(tv.b, (B,) + tv.b.shape))
    a = rng.uniform_torus(k4, (B, p.n))
    want = bootstrap.blind_rotate(tv_b, a, bk, impl="jnp")

    kp = pk.get_kernel_plan(p.N, bk.primes, p.l, p.Bg_bit, p.k, bt=32)
    assert kp.nl == 1 and kp.P == 2   # TORUS32: single limb, two primes
    log_N2 = int(math.log2(2 * p.N))
    a_int = torus.torus2int(a, log_N2).astype(jnp.int32)
    acc = pk.blind_rotate_scan(
        tv_b.stacked(), jnp.moveaxis(a_int, -1, 0),
        bk.v.astype(jnp.uint32), bk.vs.astype(jnp.uint32), kp,
        interpret=True)
    got = trlwe.from_stacked(acc)
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))


# =========================================================================
# Round 2: the full bootstrap/keyswitch family under TORUS32
# =========================================================================

def _bs_keys(seed, unfolding=1, p=P32):
    kk = jax.random.split(jax.random.PRNGKey(seed), 8)
    kt = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bk = bootstrap.new_key(kk[2], gk, kt, unfolding)
    return kk, kt, kr, ko, gk, bk


def test_torus_helpers():
    assert int(torus.double2torus(0.5)) == 1 << 31
    assert int(torus.torus2int(jnp.uint32(1 << 28), 4)) == 1
    d = torus.gadget_decompose(rng.uniform_torus(jax.random.PRNGKey(4), (8,)),
                               7, 3)
    assert d.dtype == jnp.int32 and d.shape == (3, 8)
    rec = torus.gadget_recompose(d, 7)
    x = rng.uniform_torus(jax.random.PRNGKey(4), (8,))
    err = np.abs(np.asarray(rec).astype(np.int64)
                 - np.asarray(x).astype(np.int64))
    err = np.minimum(err, (1 << 32) - err)
    assert err.max() <= 1 << (32 - 21 - 1), err.max()


def test_programmable_bootstrap():
    kk, kt, kr, ko, gk, bk = _bs_keys(21)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P32.k, P32.N)
    m = 2
    c = tlwe.encrypt(torus.double2torus(m / 64.0), kt, kk[4])
    out = bootstrap.programmable_bootstrap(tv, c, bk, 3, 3, 1)
    assert _err(tlwe.phase(out, ko), luts[m]) < 1 << 26


def test_blind_rotate_unfolded_and_kernel():
    for u in (2, 4):
        kk, kt, kr, ko, gk, bk = _bs_keys(22 + u, unfolding=u)
        luts = rng.uniform_torus(kk[3], (4,))
        tv = trlwe.torus_packing(luts, P32.k, P32.N)
        c = tlwe.encrypt(torus.double2torus(1 / 8.0), kt, kk[4])
        out = bootstrap.functional_bootstrap(tv, c, bk, 4)
        assert _err(tlwe.phase(out, ko), luts[1]) < 1 << 26, f"u={u}"


def test_unfolded_kernel_bit_exact_t32():
    """Fused unfolded kernel, single-limb path, == jnp (interpret)."""
    p = params.TFHEParams(n=8, N=128, k=1, l=2, Bg_bit=8, t=5, base_bit=4,
                          lwe_sigma=2.0**-20, rlwe_sigma=2.0**-25, name="T32K")
    kk, kt, kr, ko, gk, bk = _bs_keys(30, unfolding=2, p=p)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    cs = tlwe.encrypt(torus.double2torus(jnp.arange(3) % 4 / 8.0), kt, kk[4])
    log_N2 = p.log_N2
    b_int = torus.torus2int(
        cs.b + bootstrap._prec_offset(4), log_N2).astype(jnp.int32)
    acc = trlwe.mul_by_xai(tv, 2 * p.N - b_int)
    want = bootstrap.blind_rotate_unfolded(acc, cs.a, bk, impl="jnp")
    got = bootstrap.blind_rotate_unfolded(acc, cs.a, bk,
                                          impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))


def test_ubr_phases_t32():
    """UBR phase1/phase2 (jnp and kernels) under TORUS32."""
    p = params.TFHEParams(n=8, N=128, k=1, l=2, Bg_bit=8, t=5, base_bit=4,
                          lwe_sigma=2.0**-20, rlwe_sigma=2.0**-25, name="T32K")
    kk, kt, kr, ko, gk, bk = _bs_keys(31, unfolding=2, p=p)
    c = tlwe.encrypt(torus.double2torus(2 / 8.0), kt, kk[4])
    sa_j = bootstrap.multivalue_bootstrap_UBR_phase1(c, bk, impl="jnp")
    sa_k = bootstrap.multivalue_bootstrap_UBR_phase1(
        c, bk, impl="pallas_interpret")
    np.testing.assert_array_equal(
        np.asarray(sa_j.v, np.uint64), np.asarray(sa_k.v, np.uint64))
    luts = rng.uniform_torus(kk[3], (2, 4))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    want = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv, c, sa_j, bk, 4, impl="jnp")
    got = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv, c, sa_k, bk, 4, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    assert _err(tlwe.phase(got, ko), np.asarray(luts)[:, 2]) < 1 << 26


def test_mv_bootstrap():
    kk, kt, kr, ko, gk, bk = _bs_keys(23)
    m = 1
    c = tlwe.encrypt(torus.double2torus(m / 8.0), kt, kk[4])
    rot = bootstrap.multivalue_bootstrap_phase1(c, bk, 4)
    lutv = [3, 0, 2, 1]
    out = bootstrap.multivalue_bootstrap_phase2(lutv, rot, 4, 2)
    want = torus.double2torus(lutv[m] / 8.0)
    assert _err(tlwe.phase(out, ko), want) < 1 << 26


P32K = params.TFHEParams(n=8, N=128, k=1, l=2, Bg_bit=8, t=5, base_bit=4,
                         lwe_sigma=2.0**-20, rlwe_sigma=2.0**-25,
                         name="T32K")


def test_mv_clot21():
    kk, kt, kr, ko, gk, bk = _bs_keys(24, p=P32K)
    luts = rng.uniform_torus(kk[3], (8,))
    tv = trlwe.torus_packing_many_lut(luts, 4, 2, P32K.k, P32K.N)
    m = 2
    # message spacing is 1/(2*torus_base) per LUT slot (`tests.c` MV test)
    c = tlwe.encrypt(torus.double2torus(m / 8.0), kt, kk[4])
    outs = bootstrap.multivalue_bootstrap_CLOT21(tv, c, bk, 4, 2)
    for j in (0, 1):
        assert _err(tlwe.phase(outs[j], ko), luts[m + 4 * j]) < 1 << 26


def test_trgsw_bootstrap_t32():
    kk, kt, kr, ko, gk, bk = _bs_keys(25)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P32.k, P32.N)
    c = tlwe.encrypt(torus.double2torus(2 / 8.0), kt, kk[4])
    g = bootstrap.functional_bootstrap_trgsw_phase1(c, bk, 4, P32.l,
                                                    P32.Bg_bit)
    out = bootstrap.functional_bootstrap_trgsw_phase2(g, tv)
    assert _err(tlwe.phase(out, ko), luts[2]) < 1 << 27


def test_circuit_bootstrap_t32():
    kk, kt, kr, ko, gk, bk = _bs_keys(26)
    kska = keyswitch.new_priv_sk_ks_key(kk[5], kr, ko, P32.t, P32.base_bit)
    kskb = keyswitch.new_packing1_ks_key(kk[6], kr, ko, P32.t, P32.base_bit)
    m0 = rng.uniform_torus(kk[3], (P32.N,))
    ctrl = trlwe.encrypt(m0, kr, kk[7])
    c = tlwe.encrypt(torus.double2torus(1 / 4.0), kt, kk[4])
    g = bootstrap.circuit_bootstrap(c, bk, kska, kskb, P32.l, P32.Bg_bit)
    out = trgsw.external_product(ctrl, trgsw.to_dft(g, gk.plan()))
    assert _err(trlwe.phase(out, kr), m0) < 1 << 28


def test_fdfb_this_work_t32():
    kk, kt, kr, ko, gk, bk = _bs_keys(27)
    tksk = tlwe.new_ks_key(kk[5], kt, ko, P32.t, P32.base_bit)
    luts = rng.uniform_torus(kk[3], (8,))
    tv = trlwe.torus_packing_many_lut(luts, 4, 2, P32.k, P32.N)
    m = 6
    c = tlwe.encrypt(torus.int2torus(jnp.uint32(m), 3), kt, kk[4])
    out = bootstrap.fdfb_this_work(tv, c, bk, tksk, 3)
    assert _err(tlwe.phase(out, ko), luts[m]) < 1 << 27


def test_fdfb_ks21_t32():
    # l * torus_base/2 must divide N for the many-LUT sign vector: use the
    # N=128, l=2 set (the TOY32 l=3 does not divide 64)
    kk, kt, kr, ko, gk, bk = _bs_keys(28, p=P32K)
    ksk = keyswitch.new_packing1_ks_key(kk[5], kr, ko, P32K.t,
                                        P32K.base_bit)
    luts = rng.uniform_torus(kk[3], (8,))
    tvp = jnp.repeat(luts, (2 * P32K.N) // 8)
    m = 5
    c = tlwe.encrypt(torus.int2torus(jnp.uint32(m), 3), kt, kk[4])
    out = bootstrap.fdfb_ks21(tvp, c, bk, ksk, 8)
    assert _err(tlwe.phase(out, ko), luts[m]) < 1 << 27


def test_public_mux_t32():
    kk = jax.random.split(jax.random.PRNGKey(29), 5)
    sk = trlwe.new_binary_key(kk[0], P32.N, P32.k, P32.rlwe_sigma)
    plan = sk.plan()
    p0 = rng.uniform_torus(kk[1], (P32.N,))
    p1 = rng.uniform_torus(kk[2], (P32.N,))
    for bit in (0, 1):
        rows = []
        for i in range(P32.l):
            h = jnp.uint32(bit) << jnp.uint32(32 - (i + 1) * P32.Bg_bit)
            m = jnp.zeros((P32.N,), jnp.uint32).at[0].set(h)
            rows.append(trlwe.encrypt(m, sk, jax.random.fold_in(kk[3], i)))
        sel_v = jnp.stack([
            jnp.asarray(trlwe.to_dft(r, plan).v) for r in rows], axis=-4)
        out = bootstrap.public_mux(p0, p1, sel_v, P32.l, P32.Bg_bit,
                                   P32.k, P32.N, plan.primes)
        want = p1 if bit else p0
        assert _err(trlwe.phase(out, sk), want) < 1 << 28, f"bit={bit}"


def test_trlwe_keyswitch_t32():
    kk = jax.random.split(jax.random.PRNGKey(33), 4)
    ok = trlwe.new_binary_key(kk[0], P32.N, P32.k, 0.0)
    ik = trlwe.new_binary_key(kk[1], P32.N, P32.k, 0.0)
    ksk = keyswitch.new_trlwe_ks_key(kk[2], ok, ik, 5, 4)
    m = torus.double2torus(jnp.arange(P32.N) / 128.0)
    c = trlwe.encrypt(m, ik, kk[3])
    out = keyswitch.trlwe_keyswitch(c, ksk)
    assert _err(trlwe.phase(out, ok), m) < 1 << 16


def test_packing1_and_priv_ks_t32():
    kk = jax.random.split(jax.random.PRNGKey(34), 5)
    kr = trlwe.new_binary_key(kk[0], P32.N, P32.k, 0.0)
    kt_ext = trlwe.extract_tlwe_key(kr)
    ksk = keyswitch.new_packing1_ks_key(kk[1], kr, kt_ext, 5, 4)
    m = torus.double2torus(3 / 16.0)
    c = tlwe.encrypt(m, kt_ext, kk[2])
    out = keyswitch.packing1_keyswitch(c, ksk)
    ph = np.asarray(trlwe.phase(out, kr))
    e0 = abs(int(ph[0]) - int(m))
    assert min(e0, (1 << 32) - e0) < 1 << 16
    pair = keyswitch.new_priv_ks_key_pair(kk[3], kr, kr, 5, 4)
    mm = rng.uniform_torus(kk[4], (P32.N,))
    cc = trlwe.encrypt(mm, kr, jax.random.fold_in(kk[4], 1))
    out2 = keyswitch.priv_keyswitch_2(cc, pair)
    want = (jnp.uint32(0) - polynomial.ntt_mul_small(
        jnp.asarray(kr.s[0], jnp.int32), mm, kr.plan()))
    assert _err(trlwe.phase(out2, kr), want) < 1 << 18


def test_full_packing_t32():
    kk = jax.random.split(jax.random.PRNGKey(35), 4)
    kr = trlwe.new_binary_key(kk[0], P32.N, P32.k, 0.0)
    kt_ext = trlwe.extract_tlwe_key(kr)
    ksk = keyswitch.new_full_packing_ks_key(kk[1], kr, kt_ext, 5, 4)
    size = 4
    ms = torus.double2torus(jnp.arange(size) / 8.0)
    cs = tlwe.encrypt(ms, kt_ext, kk[2])
    out = keyswitch.full_packing_keyswitch(cs, size, ksk)
    ph = np.asarray(trlwe.phase(out, kr))[:size]
    d = np.abs(ph.astype(np.int64) - np.asarray(ms).astype(np.int64))
    assert np.minimum(d, (1 << 32) - d).max() < 1 << 16


def test_automorphism_t32():
    kk = jax.random.split(jax.random.PRNGKey(36), 3)
    kr = trlwe.new_binary_key(kk[0], P32.N, P32.k, 0.0)
    gen = 5
    ks_auto = keyswitch.new_automorphism_ks_keyset(
        kk[1], kr, (gen,), 5, 4)
    m = rng.uniform_torus(kk[2], (P32.N,))
    c = trlwe.encrypt(m, kr, jax.random.fold_in(kk[2], 1))
    out = keyswitch.eval_automorphism(c, gen, ks_auto[gen])
    want = polynomial.permute(m, gen)
    assert _err(trlwe.phase(out, kr), want) < 1 << 16


def test_seeded_t32():
    kk = jax.random.split(jax.random.PRNGKey(37), 2)
    from mosfhet_tpu import seeded
    kr = trlwe.new_binary_key(kk[0], P32.N, P32.k, 2.0**-25)
    m = rng.uniform_torus(kk[1], (P32.N,))
    c = seeded.encrypt(m, kr, jax.random.fold_in(kk[1], 1))
    full = seeded.expand(c)
    assert _err(trlwe.phase(full, kr), m) < 1 << 10


def test_extract_variants_t32():
    kk = jax.random.split(jax.random.PRNGKey(38), 2)
    kr = trlwe.new_binary_key(kk[0], P32.N, P32.k, 0.0)
    ko = trlwe.extract_tlwe_key(kr)
    m = rng.uniform_torus(kk[1], (P32.N,))
    c = trlwe.encrypt(m, kr, jax.random.fold_in(kk[1], 3))
    for idx in (0, 5, P32.N - 1):
        t = trlwe.extract_tlwe(c, idx)
        e = abs(int(tlwe.phase(t, ko)) - int(m[idx]))
        assert min(e, (1 << 32) - e) < 1 << 10, idx
    amount = 4
    outs = trlwe.mv_extract_tlwe(c, amount)
    m_np = np.asarray(m, np.uint32)
    for i, o in enumerate(outs):
        if i < amount // 2:
            want = m_np[i]
        else:
            want = np.uint32(0) - m_np[P32.N - 1 - (i - amount // 2)]
        assert _err(tlwe.phase(o, ko), want) < 1 << 10, i


def test_ga_bootstrap_t32():
    from mosfhet_tpu import bootstrap_ga
    p = P32
    kk = jax.random.split(jax.random.PRNGKey(39), 5)
    kt = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bkg = bootstrap_ga.new_key(kk[2], gk, kt)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    c = tlwe.encrypt(torus.double2torus(1 / 8.0), kt, kk[4])
    out = bootstrap_ga.functional_bootstrap_ga(tv, c, bkg, 4)
    assert _err(tlwe.phase(out, ko), luts[1]) < 1 << 27
