"""Functional/programmable bootstrap tests, mirroring
`test_functional_bootstrap` (`tests.c:1578-1612`) on TOY parameters,
plus batching and the multi-value variants."""

import numpy as np
import jax
import jax.numpy as jnp

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus

P = params.TOY
KEY = jax.random.PRNGKey(99)


def setup_keys(seed=0, unfolding=1, p=P):
    k0, k1, k2 = jax.random.split(jax.random.fold_in(KEY, seed), 3)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, key_tlwe, unfolding)
    return key_tlwe, key_trlwe, key_out, gk, bk


def assert_torus_within(delta, want, got, msg=""):
    diff = np.abs(np.asarray(
        jnp.asarray(got, jnp.uint64) - jnp.asarray(want, jnp.uint64)
    ).view(np.int64).astype(np.float64))
    assert np.all(diff <= delta), f"{msg}: max err 2^{np.log2(diff.max()+1):.1f}"


def lut_trlwe(values, p=P):
    return trlwe.torus_packing(jnp.asarray(values, jnp.uint64), p.k, p.N)


def test_functional_bootstrap():
    key_tlwe, _, key_out, _, bk = setup_keys(0)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 50), (4,))
    tv = lut_trlwe(luts)
    for m in range(4):
        c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                         jax.random.fold_in(KEY, 60 + m))
        out = bootstrap.functional_bootstrap(tv, c, bk, 4)
        assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out),
                            f"bootstrap m={m}")


def test_functional_bootstrap_batched():
    """One fused batched bootstrap decrypts all four slots."""
    key_tlwe, _, key_out, _, bk = setup_keys(1)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 51), (4,))
    tv = lut_trlwe(luts)
    ms = torus.double2torus(jnp.arange(4) / 8.0)
    cs = tlwe.encrypt(ms, key_tlwe, jax.random.fold_in(KEY, 61))
    outs = bootstrap.functional_bootstrap(tv, cs, bk, 4)
    assert outs.a.shape == (4, P.k * P.N)
    assert_torus_within(1 << 58, luts, tlwe.phase(outs, key_out), "batched")


def test_functional_bootstrap_unfolded():
    """Unfolded blind rotate (u=2,4) matches (`bootstrap.c:124-148`)."""
    for u in (2, 4):
        key_tlwe, _, key_out, _, bk = setup_keys(2 + u, unfolding=u)
        luts = rng.uniform_torus(jax.random.fold_in(KEY, 52 + u), (4,))
        tv = lut_trlwe(luts)
        m = 2
        c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                         jax.random.fold_in(KEY, 70 + u))
        out = bootstrap.functional_bootstrap(tv, c, bk, 4)
        assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out),
                            f"unfold={u}")


def test_programmable_bootstrap():
    """Input rounding path (`programmable_bootstrap`, `bootstrap.c:208-220`,
    test `tests.c:1540-1566`)."""
    key_tlwe, key_trlwe, key_out, _, bk = setup_keys(7)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 53), (4,))
    tv = lut_trlwe(luts)
    # 2/64 << kappa=3 -> 1/4 -> slot 2 of 4 (same shape as `tests.c:1563-1565`)
    c = tlwe.encrypt(torus.int2torus(jnp.uint64(0x2), 6), key_tlwe,
                     jax.random.fold_in(KEY, 80))
    out = bootstrap.programmable_bootstrap(tv, c, bk, 3, 3, 0)
    assert_torus_within(1 << 58, luts[2], tlwe.phase(out, key_out), "pbs")


def test_multivalue_CLOT21():
    """2 LUTs from one blind rotate (`tests.c` test_multivalue_bootstrap;
    `bootstrap.c:222-230`)."""
    key_tlwe, _, key_out, _, bk = setup_keys(8)
    tb, n_luts = 2, 2
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 54), (tb * n_luts,))
    tv = trlwe.torus_packing_many_lut(luts, tb, n_luts, P.k, P.N)
    m = 1
    c = tlwe.encrypt(torus.double2torus(m / (2 * tb)), key_tlwe,
                     jax.random.fold_in(KEY, 81))
    outs = bootstrap.multivalue_bootstrap_CLOT21(tv, c, bk, tb, n_luts)
    for j in range(n_luts):
        assert_torus_within(1 << 58, luts[j * tb + m],
                            tlwe.phase(outs[j], key_out), f"lut {j}")


def test_multivalue_phase1_phase2():
    """Factorized multi-value bootstrap (`bootstrap.c:232-265`):
    phase1 once, compose integer LUTs in cleartext."""
    key_tlwe, _, key_out, _, bk = setup_keys(9)
    tb, log_tb = 4, 2
    m = 3
    c = tlwe.encrypt(torus.double2torus(m / (2 * tb)), key_tlwe,
                     jax.random.fold_in(KEY, 82))
    rotated = bootstrap.multivalue_bootstrap_phase1(c, bk, tb)
    lut = [1, 0, 3, 2]
    out = bootstrap.multivalue_bootstrap_phase2(lut, rotated, tb, log_tb)
    # output scale: lut[m]/(2*tb) on the torus (`tests.c:1819`)
    want = torus.double2torus(lut[m] / (2 * tb))
    assert_torus_within(1 << 58, want, tlwe.phase(out, key_out), "phase2")


def test_multivalue_UBR():
    """UBR: cache per-group TRGSW products, reuse across test vectors
    (`bootstrap.c:151-190`)."""
    u = 2
    key_tlwe, _, key_out, _, bk = setup_keys(10, unfolding=u)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 55), (4,))
    tv = lut_trlwe(luts)
    m = 1
    c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                     jax.random.fold_in(KEY, 83))
    sa = bootstrap.multivalue_bootstrap_UBR_phase1(c, bk)
    out = bootstrap.multivalue_bootstrap_UBR_phase2(tv, c, sa, bk, 4)
    assert_torus_within(1 << 58, luts[m], tlwe.phase(out, key_out), "UBR")


def test_multivalue_phase2_many():
    """Vectorized K-LUT phase 2 == K individual phase-2 calls, bit-exact."""
    key_tlwe, _, key_out, _, bk = setup_keys(11)
    m = 2
    c = tlwe.encrypt(torus.double2torus(m / 8.0), key_tlwe,
                     jax.random.fold_in(KEY, 82))
    rot = bootstrap.multivalue_bootstrap_phase1(c, bk, 4)
    luts = [[3, 0, 2, 1], [1, 1, 2, 3], [0, 3, 3, 0]]
    many = bootstrap.multivalue_bootstrap_phase2_many(luts, rot, 4, 2)
    for ki, lv in enumerate(luts):
        one = bootstrap.multivalue_bootstrap_phase2(lv, rot, 4, 2)
        np.testing.assert_array_equal(np.asarray(one.a),
                                      np.asarray(many.a[ki]))
        np.testing.assert_array_equal(np.asarray(one.b),
                                      np.asarray(many.b[ki]))
        assert_torus_within(1 << 58, torus.double2torus(lv[m] / 8.0),
                            tlwe.phase(one, key_out), f"lut {ki}")
