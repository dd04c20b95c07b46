"""GA blind rotate: fused kernel path == jnp path, bit-exact (interpret).

The pallas path runs the external product in `cmux_delta` and the
data-dependent automorphism keyswitch in the per-row-key Barrett kernel
(`ops/pbs_kernel.auto_keyswitch`); both must reproduce the jnp scan
bit-for-bit (reference `bootstrap_ga.c:39-60`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap_ga, rng, torus

KEY = jax.random.PRNGKey(888)

P_GA = params.TFHEParams(
    n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
    lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="GA_TEST",
)


def test_ga_kernel_mxu(monkeypatch):
    """GA kernel path under MOSFHET_NTT_MXU=1 (int8-matmul NTT tails in
    cmux_delta and both auto-keyswitch kernels) stays bit-identical to
    the jnp path, on the DMA-stream and gather key routes."""
    kk = jax.random.split(jax.random.fold_in(KEY, 9), 5)
    kt = tlwe.new_binary_key(kk[0], P_GA.n, P_GA.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], P_GA.N, P_GA.k, P_GA.rlwe_sigma)
    gk = trgsw.new_key(kr, P_GA.l, P_GA.Bg_bit)
    bkg = bootstrap_ga.new_key(kk[2], gk, kt)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P_GA.k, P_GA.N)
    ms = torus.double2torus(jnp.arange(2) / 8.0)
    cs = tlwe.encrypt(ms, kt, kk[4])
    want = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg, impl="jnp")
    monkeypatch.setenv("MOSFHET_NTT_MXU", "1")
    monkeypatch.setenv("MOSFHET_GA_ONEKERNEL", "0")  # pin two-kernel path
    got = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                       impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    monkeypatch.setenv("MOSFHET_GA_STREAM", "0")
    got2 = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                        impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got2.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got2.b))


def test_ga_kernel_bit_exact(monkeypatch):
    monkeypatch.setenv("MOSFHET_GA_ONEKERNEL", "0")  # pin two-kernel path
    kk = jax.random.split(KEY, 5)
    kt = tlwe.new_binary_key(kk[0], P_GA.n, P_GA.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], P_GA.N, P_GA.k, P_GA.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, P_GA.l, P_GA.Bg_bit)
    bkg = bootstrap_ga.new_key(kk[2], gk, kt)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P_GA.k, P_GA.N)
    ms = torus.double2torus(jnp.arange(3) / 8.0)      # batch 3: pad path
    cs = tlwe.encrypt(ms, kt, kk[4])
    want = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg, impl="jnp")
    got = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                       impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    # and the whole GA bootstrap decrypts through the kernel path
    log_N2 = P_GA.log_N2
    b_int = torus.torus2int(
        cs.b + bootstrap_ga._prec_offset(4), log_N2).astype(jnp.int32)
    acc = trlwe.mul_by_xai(tv, 2 * P_GA.N - b_int)
    rot = bootstrap_ga.blind_rotate_ga(acc, cs.a, bkg,
                                       impl="pallas_interpret")
    out = trlwe.extract_tlwe(rot, 0)
    ph = np.asarray(tlwe.phase(out, ko), np.uint64)
    want_v = np.asarray(luts, np.uint64)[np.arange(3)]
    err = np.abs((ph - want_v).view(np.int64).astype(np.float64))
    assert err.max() <= float(1 << 58), f"err 2^{np.log2(err.max()+1):.1f}"


def test_take_lanes_wide_bit_exact():
    """`_take_lanes_wide` / `_galois_permute_limbs` (the factorized wide
    lane gather used by every production fused-permute shape, N >= 256)
    vs jnp.take_along_axis, over random odd generators.  The P_GA parity
    tests above use N=128 and take the single-vreg `_take_lanes`
    fallback; this pins the wide path's bit-exactness in CI (advisor
    round-4 medium finding)."""
    from mosfhet_tpu.ops import pbs_kernel as pk
    rs = np.random.RandomState(7)
    for N in (256, 1024, 2048):
        BT = 8
        lo = jnp.asarray(rs.randint(0, 2**32, (BT, N), np.uint64),
                         jnp.uint32)
        hi = jnp.asarray(rs.randint(0, 2**32, (BT, N), np.uint64),
                         jnp.uint32)
        gen = rs.randint(0, N, BT) * 2 + 1          # odd gens mod 2N
        ginv = np.array([pow(int(g), -1, 2 * N) for g in gen], np.int32)
        ginv_col = jnp.asarray(ginv[:, None])
        # oracle: out[j] = +- in[(j*ginv mod 2N) mod N]
        j = np.arange(N)[None, :]
        ic = (j * ginv[:, None]) % (2 * N)
        gidx = ic % N
        neg = (ic & N) != 0
        v = (np.asarray(lo, np.uint64)
             | (np.asarray(hi, np.uint64) << np.uint64(32)))
        want = np.take_along_axis(v, gidx, axis=1)
        want = np.where(neg, np.uint64(0) - want, want)
        # direct wide-gather check (unsigned, no negation)
        got_g = pk._take_lanes_wide(lo, jnp.asarray(gidx, jnp.int32), N)
        np.testing.assert_array_equal(
            np.asarray(got_g), np.take_along_axis(np.asarray(lo), gidx, 1))
        # full permute with the conditional negation, both limbs
        glo, ghi = pk._galois_permute_limbs(lo, hi, ginv_col, N)
        got = (np.asarray(glo, np.uint64)
               | (np.asarray(ghi, np.uint64) << np.uint64(32)))
        np.testing.assert_array_equal(got, want)
        # single-limb (TORUS32) form
        glo1, none = pk._galois_permute_limbs(lo, None, ginv_col, N)
        assert none is None
        want32 = np.take_along_axis(np.asarray(lo), gidx, 1)
        want32 = np.where(neg, np.uint32(0) - want32, want32)
        np.testing.assert_array_equal(np.asarray(glo1), want32)


def test_ga_kernel_fused_permute(monkeypatch):
    """The in-kernel Galois permutation (MOSFHET_GA_FUSED=1, one dynamic
    lane gather per limb inside the stream keyswitch kernel) must be
    bit-identical to the XLA `_permute_log` + stream-kernel path, and to
    the jnp scan."""
    kk = jax.random.split(jax.random.fold_in(KEY, 21), 5)
    kt = tlwe.new_binary_key(kk[0], P_GA.n, P_GA.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], P_GA.N, P_GA.k, P_GA.rlwe_sigma)
    gk = trgsw.new_key(kr, P_GA.l, P_GA.Bg_bit)
    bkg = bootstrap_ga.new_key(kk[2], gk, kt)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P_GA.k, P_GA.N)
    ms = torus.double2torus(jnp.arange(3) / 8.0)   # odd batch: padding path
    cs = tlwe.encrypt(ms, kt, kk[4])
    want = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg, impl="jnp")
    monkeypatch.setenv("MOSFHET_GA_ONEKERNEL", "0")  # pin two-kernel path
    monkeypatch.setenv("MOSFHET_GA_FUSED", "1")
    got_f = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                         impl="pallas_interpret")
    monkeypatch.setenv("MOSFHET_GA_FUSED", "0")
    got_u = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                         impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got_f.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got_f.b))
    np.testing.assert_array_equal(np.asarray(got_u.a), np.asarray(got_f.a))
    np.testing.assert_array_equal(np.asarray(got_u.b), np.asarray(got_f.b))


def test_ga_onekernel_bit_exact(monkeypatch):
    """MOSFHET_GA_ONEKERNEL=1 (whole-scan fused GA kernel: external
    product + in-kernel permute + DMA-streamed auto-KS per grid step,
    `ops/pbs_kernel.ga_scan_fused`) is bit-identical to the jnp scan,
    including the padded-batch path."""
    kk = jax.random.split(jax.random.fold_in(KEY, 33), 5)
    kt = tlwe.new_binary_key(kk[0], P_GA.n, P_GA.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], P_GA.N, P_GA.k, P_GA.rlwe_sigma)
    gk = trgsw.new_key(kr, P_GA.l, P_GA.Bg_bit)
    bkg = bootstrap_ga.new_key(kk[2], gk, kt)
    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, P_GA.k, P_GA.N)
    ms = torus.double2torus(jnp.arange(3) / 8.0)   # batch 3: pad path
    cs = tlwe.encrypt(ms, kt, kk[4])
    want = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg, impl="jnp")
    monkeypatch.setenv("MOSFHET_GA_ONEKERNEL", "1")
    got = bootstrap_ga.blind_rotate_ga(tv, cs.a, bkg,
                                       impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
