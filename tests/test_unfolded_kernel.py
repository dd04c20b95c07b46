"""The unfolded/UBR Pallas kernels must be bit-identical to the jnp paths.

Covers (in Pallas interpreter mode on the CPU test platform):
- the u32 Barrett primitive `_barrett_lazy` against exact integer products,
- the fused unfolded blind rotate (`ops/pbs_kernel.unfolded_rotate`) vs
  `blind_rotate_unfolded(impl="jnp")` (reference `bootstrap.c:124-148`),
- the UBR phase-1 combine kernel vs the jnp phase 1,
- the UBR phase-2 apply scan vs the jnp phase 2 (`bootstrap.c:151-190`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
from mosfhet_tpu import ntt as _ntt
from mosfhet_tpu.ops import pbs_kernel as pk

KEY = jax.random.PRNGKey(777)

P_UNFOLD = params.TFHEParams(
    n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
    lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="UNFOLD_TEST",
)


def setup(seed, unfolding, p=P_UNFOLD):
    k0, k1, k2 = jax.random.split(jax.random.fold_in(KEY, seed), 3)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, key_tlwe, unfolding)
    return key_tlwe, key_out, bk


def test_barrett_lazy_exact():
    """_barrett_lazy against big-int products at every master prime."""
    rng_np = np.random.default_rng(5)
    for p in _ntt.MASTER_PRIMES:
        mu62 = (1 << 62) // p
        mup = mu62 - (1 << 32)
        a = rng_np.integers(0, 2 * p, size=4096, dtype=np.uint32)
        b = rng_np.integers(0, p, size=4096, dtype=np.uint32)
        got = np.asarray(
            pk._barrett_lazy(jnp.asarray(a), jnp.asarray(b), p, mup))
        want = (a.astype(np.uint64) * b.astype(np.uint64)) % p
        assert np.all(got < 2 * p)
        np.testing.assert_array_equal(got % p, want)


def test_limbs_to_resi_exact():
    """Centered u64-limb reduction matches ntt.to_resi_u64."""
    kp = pk.get_kernel_plan(128, _ntt.DEFAULT_PRIMES, 2, 10, 1)
    plan = _ntt.get_plan(128, _ntt.DEFAULT_PRIMES)
    rng_np = np.random.default_rng(6)
    x = jnp.asarray(
        rng_np.integers(0, 1 << 64, size=(8, 128), dtype=np.uint64))
    want = np.asarray(_ntt.to_resi_u64(x, plan))         # [8, P, 128]
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    for p_i in range(kp.P):
        got = np.asarray(pk._limbs_to_resi(lo, hi, kp, p_i))
        p = kp.primes[p_i]
        assert np.all(got < 2 * p)
        np.testing.assert_array_equal(got % p, want[:, p_i, :] % p)


@pytest.mark.parametrize("u", [2, 4])
def test_unfolded_rotate_kernel_bit_exact(u):
    """Fused unfolded blind rotate == jnp path, incl. batch padding."""
    key_tlwe, key_out, bk = setup(10 + u, unfolding=u)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 20 + u), (4,))
    tv = trlwe.torus_packing(luts, P_UNFOLD.k, P_UNFOLD.N)
    ms = torus.double2torus(jnp.arange(5) % 4 / 8.0)     # batch 5: pad path
    cs = tlwe.encrypt(ms, key_tlwe, jax.random.fold_in(KEY, 30 + u))
    log_N2 = P_UNFOLD.log_N2
    b_int = torus.torus2int(
        cs.b + bootstrap._prec_offset(4), log_N2).astype(jnp.int32)
    acc = trlwe.mul_by_xai(tv, 2 * P_UNFOLD.N - b_int)
    want = bootstrap.blind_rotate_unfolded(acc, cs.a, bk, impl="jnp")
    got = bootstrap.blind_rotate_unfolded(acc, cs.a, bk,
                                          impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))


def test_ubr_phase1_kernel_bit_exact():
    """Phase-1 combine kernel == jnp phase 1 (values; kernel emits u32)."""
    u = 2
    key_tlwe, key_out, bk = setup(40, unfolding=u)
    m = torus.double2torus(2 / 8.0)
    c = tlwe.encrypt(m, key_tlwe, jax.random.fold_in(KEY, 41))
    want = bootstrap.multivalue_bootstrap_UBR_phase1(c, bk, impl="jnp")
    got = bootstrap.multivalue_bootstrap_UBR_phase1(
        c, bk, impl="pallas_interpret")
    assert got.vs is None
    np.testing.assert_array_equal(
        np.asarray(want.v, dtype=np.uint64),
        np.asarray(got.v, dtype=np.uint64))


def test_ubr_phase2_kernel_bit_exact():
    """Phase-2 apply scan == jnp phase 2 on a batch of LUT test vectors."""
    u = 2
    key_tlwe, key_out, bk = setup(50, unfolding=u)
    m = torus.double2torus(1 / 8.0)
    c = tlwe.encrypt(m, key_tlwe, jax.random.fold_in(KEY, 51))
    sa = bootstrap.multivalue_bootstrap_UBR_phase1(c, bk, impl="jnp")
    # batch of 3 different LUTs (non-multiple of the kernel tile: pad path)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 52), (3, 4))
    tv = trlwe.torus_packing(luts, P_UNFOLD.k, P_UNFOLD.N)
    want = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv, c, sa, bk, 4, impl="jnp")
    got = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv, c, sa, bk, 4, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    # and the phase-1-kernel -> phase-2-kernel composition decrypts
    sa_k = bootstrap.multivalue_bootstrap_UBR_phase1(
        c, bk, impl="pallas_interpret")
    got2 = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv, c, sa_k, bk, 4, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got2.a))
    ph = np.asarray(tlwe.phase(got2, key_out), dtype=np.uint64)
    wantv = np.asarray(luts, dtype=np.uint64)[:, 1]      # slot of m=1/8
    err = np.abs((ph - wantv).view(np.int64).astype(np.float64))
    assert err.max() <= float(1 << 58)


def test_unfolded_and_apply_kernels_mxu(monkeypatch):
    """Unfolded rotate + UBR phase-2 apply kernels under the MXU plan
    (`MOSFHET_NTT_MXU=1`: forward tails + inverse heads on the int8
    matmul path) stay bit-identical to the jnp paths."""
    u = 2
    key_tlwe, key_out, bk = setup(70, unfolding=u)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 71), (4,))
    tv = trlwe.torus_packing(luts, P_UNFOLD.k, P_UNFOLD.N)
    ms = torus.double2torus(jnp.arange(3) % 4 / 8.0)
    cs = tlwe.encrypt(ms, key_tlwe, jax.random.fold_in(KEY, 72))
    log_N2 = P_UNFOLD.log_N2
    b_int = torus.torus2int(
        cs.b + bootstrap._prec_offset(4), log_N2).astype(jnp.int32)
    acc = trlwe.mul_by_xai(tv, 2 * P_UNFOLD.N - b_int)
    want = bootstrap.blind_rotate_unfolded(acc, cs.a, bk, impl="jnp")

    c1 = tlwe.encrypt(torus.double2torus(1 / 8.0), key_tlwe,
                      jax.random.fold_in(KEY, 73))
    sa = bootstrap.multivalue_bootstrap_UBR_phase1(c1, bk, impl="jnp")
    luts2 = rng.uniform_torus(jax.random.fold_in(KEY, 74), (3, 4))
    tv2 = trlwe.torus_packing(luts2, P_UNFOLD.k, P_UNFOLD.N)
    want2 = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv2, c1, sa, bk, 4, impl="jnp")

    monkeypatch.setenv("MOSFHET_NTT_MXU", "1")
    got = bootstrap.blind_rotate_unfolded(acc, cs.a, bk,
                                          impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    got2 = bootstrap.multivalue_bootstrap_UBR_phase2(
        tv2, c1, sa, bk, 4, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want2.a), np.asarray(got2.a))
    np.testing.assert_array_equal(np.asarray(want2.b), np.asarray(got2.b))
    sa_k = bootstrap.multivalue_bootstrap_UBR_phase1(
        c1, bk, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(sa.v, dtype=np.uint64),
                                  np.asarray(sa_k.v, dtype=np.uint64))


def test_unfolded_bootstrap_e2e_kernel():
    """functional_bootstrap through the fused unfolded kernel decrypts."""
    u = 4
    key_tlwe, key_out, bk = setup(60, unfolding=u)
    luts = rng.uniform_torus(jax.random.fold_in(KEY, 61), (4,))
    tv = trlwe.torus_packing(luts, P_UNFOLD.k, P_UNFOLD.N)
    ms = torus.double2torus(jnp.arange(4) / 8.0)
    cs = tlwe.encrypt(ms, key_tlwe, jax.random.fold_in(KEY, 62))
    log_N2 = P_UNFOLD.log_N2
    b_int = torus.torus2int(
        cs.b + bootstrap._prec_offset(4), log_N2).astype(jnp.int32)
    acc = trlwe.mul_by_xai(tv, 2 * P_UNFOLD.N - b_int)
    rot = bootstrap.blind_rotate_unfolded(acc, cs.a, bk,
                                          impl="pallas_interpret")
    out = trlwe.extract_tlwe(rot, 0)
    ph = np.asarray(tlwe.phase(out, key_out), dtype=np.uint64)
    want = np.asarray(luts, dtype=np.uint64)
    err = np.abs((ph - want).view(np.int64).astype(np.float64))
    assert err.max() <= float(1 << 58)


def test_external_product_kernel_paths():
    """trgsw.external_product pallas path == jnp, broadcast and per-row
    keys, incl. batch padding."""
    from mosfhet_tpu import trgsw
    p = P_UNFOLD
    k0, k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, 99), 4)
    kr = trlwe.new_binary_key(k0, p.N, p.k, p.rlwe_sigma)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    plan = gk.plan()
    m = rng.uniform_torus(k1, (3, p.N))          # batch 3: pad path
    c = trlwe.encrypt(m, kr, k2)
    g = trgsw.to_dft(trgsw.monomial_encrypt(1, 5, gk, k3), plan)
    want = trgsw.external_product(c, g, impl="jnp")
    got = trgsw.external_product(c, g, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    # per-row: a batch of TRGSWs (one per ciphertext row)
    gs = jax.vmap(lambda e, rk: trgsw.to_dft(
        trgsw.monomial_encrypt(1, e, gk, rk), plan).v)(
        jnp.arange(3), jax.random.split(k3, 3))
    gb = trgsw.TRGSWDFT(v=gs, vs=_ntt.make_shoup(gs, plan.p[:, None]),
                        l=p.l, Bg_bit=p.Bg_bit, primes=plan.primes)
    want2 = trgsw.external_product(c, gb, impl="jnp")
    got2 = trgsw.external_product(c, gb, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want2.a), np.asarray(got2.a))
    np.testing.assert_array_equal(np.asarray(want2.b), np.asarray(got2.b))


def test_ubr_phase1_v2_bit_exact():
    """The streaming phase-1 combine (`ubr_phase1_combine_v2`: groups on
    the grid, ONE dynamic-scalar roll per mask combination) equals the
    group-tiled v1 kernel bit-for-bit, both NTT plans, including rot=2N
    endpoints."""
    import numpy as np
    import jax.numpy as jnp
    from mosfhet_tpu import ntt as _ntt
    from mosfhet_tpu.ops import pbs_kernel as pk
    N, k, l, Bg_bit = 256, 1, 2, 9
    C = k + 1
    J = C * l
    JC = J * C
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    rng = np.random.default_rng(11)
    G, M, B = 4, 8, 2
    su64 = jnp.asarray(rng.integers(0, 1 << 64, (G, M, JC, N), np.uint64))
    su_planes = jnp.stack(
        [(su64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
         (su64 >> jnp.uint64(32)).astype(jnp.uint32)])
    rot = jnp.asarray(rng.integers(0, 2 * N + 1, (B, G, M), np.int32))
    for mxu in (False, True):
        kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=mxu)
        su_t = pk.tile_su_planes(su_planes, kp)
        rot_t = pk.tile_rot(rot, kp, G)
        want = pk.merge_phase1_out(
            pk.ubr_phase1_combine(su_t, rot_t, kp, interpret=True), G)
        got = pk.ubr_phase1_combine_v2(su_planes, rot, kp, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_ubr_phase1_v2_e2e(monkeypatch):
    """MOSFHET_UBR_V2=1 through `multivalue_bootstrap_UBR_phase1`:
    bit-identical to the default kernel path."""
    import numpy as np
    import jax
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, torus
    import jax.numpy as jnp
    p = params.TOY
    kk = jax.random.split(jax.random.PRNGKey(909), 5)
    kt = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bk = bootstrap.new_key(kk[2], gk, kt, 2)
    ms = torus.double2torus(jnp.arange(2) / 8.0)
    cs = tlwe.encrypt(ms, kt, kk[3])
    monkeypatch.setenv("MOSFHET_UBR_V2", "0")
    want = bootstrap.multivalue_bootstrap_UBR_phase1(
        cs, bk, impl="pallas_interpret")
    monkeypatch.setenv("MOSFHET_UBR_V2", "1")
    got = bootstrap.multivalue_bootstrap_UBR_phase1(
        cs, bk, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.v), np.asarray(got.v))
