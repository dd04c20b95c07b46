"""Cross-lower every fused-kernel entry point for TPU (Mosaic), on CPU.

Interpret-mode tests prove the kernels bit-exact but never run the Mosaic
lowering pass, so lowering-only failures (e.g. newaxis indexing inside a
kernel becoming a 1-D gather — ``NotImplementedError: Only 2D gather is
supported``) reach real hardware first.  These tests AOT-lower each
kernel entry point with ``lowering_platforms=('tpu',)``, which runs the
full Pallas→Mosaic pipeline without needing a TPU device, under every
NTT plan (default lane-roll, int8-MXU tail/head, narrow-prime lazy
chains).  Reference op family: `/root/reference/src/trgsw.c:385-423`,
`bootstrap.c:107-190`, `bootstrap_ga.c:39-60`, `keyswitch.c:289-303`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosfhet_tpu import ntt as _ntt
from mosfhet_tpu.ops import pbs_kernel as pk

N, k, l, Bg_bit = 2048, 1, 4, 9          # TFHEPP_L2 kernel geometry
C = k + 1
J = C * l
B = pk.DEFAULT_BT                        # one batch tile


def _lower_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _plan(mode: str):
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    if mode == "narrow":
        primes = _ntt.NARROW_PRIMES
        assert np.prod([float(p) for p in primes]) > 2 * bound
    else:
        primes = _ntt.primes_for_bound(bound)
    return pk.get_kernel_plan(N, primes, l, Bg_bit, k,
                              mxu=("mxu" in mode),
                              rot_ntt=("rotntt" in mode))


def _rand(shape, dtype=np.uint64, hi=None, rng=np.random.default_rng(7)):
    hi = hi if hi is not None else np.iinfo(dtype).max
    return jnp.asarray(rng.integers(0, hi, shape, dtype=np.int64
                                    if dtype == np.int32 else np.uint64)
                       .astype(dtype))


def _key(kp, *lead):
    """Exact NTT-domain residues [*lead, C, P, N] u32 < min(p)."""
    return _rand(lead + (C, kp.P, N), np.uint64,
                 hi=min(kp.primes)).astype(jnp.uint32)


@pytest.mark.parametrize("mode", ["default", "mxu", "narrow",
                                  "rotntt", "rotntt_mxu"])
def test_lower_blind_rotate_scan(mode):
    kp = _plan(mode)
    acc = _rand((B, C, N))
    a = _rand((2, B), np.int32, hi=2 * N)
    kv = _key(kp, 2, J)
    _lower_tpu(lambda acc, a, kv:
               pk.blind_rotate_scan(acc, a, kv, kv, kp), acc, a, kv)


@pytest.mark.parametrize("mode", ["default", "mxu", "narrow"])
def test_lower_cmux_delta(mode):
    kp = _plan(mode)
    rot = _rand((B, C, N))
    kv = _key(kp, J)
    _lower_tpu(lambda rot, kv: pk.cmux_delta(rot, kv, kv, kp), rot, kv)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_ext_product_apply_scan(mode):
    kp = _plan(mode)
    acc = _rand((B, C, N))
    sa = _key(kp, 2, J)
    _lower_tpu(lambda acc, sa:
               pk.ext_product_apply_scan(acc, sa, kp), acc, sa)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_unfolded_rotate(mode):
    kp = _plan(mode)
    G, M = 2, 4                          # u = 2
    acc = _rand((B, C, N))
    rot = _rand((B, G, M), np.int32, hi=2 * N)
    su = _rand((kp.nl, G, M, J * C, N), np.uint64).astype(jnp.uint32)
    _lower_tpu(lambda acc, rot, su:
               pk.unfolded_rotate(acc, rot, su, kp), acc, rot, su)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_ubr_phase1_combine(mode):
    kp = _plan(mode)
    G, M = 2, 4
    su = _rand((kp.nl, G, M, J * C, N), np.uint64).astype(jnp.uint32)
    rot = _rand((B, G, M), np.int32, hi=2 * N)

    def fn(su, rot):
        su_t = pk.tile_su_planes(su, kp)
        rot_t = pk.tile_rot(rot, kp, G)
        return pk.ubr_phase1_combine(su_t, rot_t, kp)

    _lower_tpu(fn, su, rot)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_auto_keyswitch(mode):
    kp = _plan(mode)
    Jk = (C - 1) * l
    perm = _rand((B, C, N))
    rows = _rand((B, Jk, C, kp.P, N), np.uint64,
                 hi=min(kp.primes)).astype(jnp.uint32)
    _lower_tpu(lambda p_, r_: pk.auto_keyswitch(p_, r_, kp), perm, rows)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_auto_keyswitch_stream(mode):
    kp = _plan(mode)
    Jk = (C - 1) * l
    G = 4
    perm = _rand((B, C, N))
    ak = _rand((G, Jk, C, kp.P, N), np.uint64,
               hi=min(kp.primes)).astype(jnp.uint32)
    kidx = _rand((B,), np.int32, hi=G)
    _lower_tpu(lambda p_, a_, i_:
               pk.auto_keyswitch_stream(p_, a_, i_, kp), perm, ak, kidx)
    # fused in-kernel Galois permutation (dynamic lane gather per limb)
    ginv = _rand((B,), np.int32, hi=2 * N) | jnp.int32(1)
    _lower_tpu(lambda p_, a_, i_, g_:
               pk.auto_keyswitch_stream(p_, a_, i_, kp, ginv=g_),
               perm, ak, kidx, ginv)


@pytest.mark.parametrize("mode", ["default", "mxu", "rotntt_mxu"])
def test_lower_tp_partial_and_finish(mode):
    kp = _plan(mode)
    j_local = J // 2
    acc = _rand((B, C, N))
    a_t = _rand((1, B, 1), np.int32, hi=2 * N)
    j0 = jnp.zeros((1,), jnp.int32)
    kv = _key(kp, j_local)

    def fn(acc, a_t, j0, kv):
        tiles = pk.split_limbs(acc, kp)
        spec = pk.partial_step_tiles(tiles, a_t, j0, kv, kv, kp)
        return pk.finish_step_tiles(tiles, spec, kp, n_parts=2)

    _lower_tpu(fn, acc, a_t, j0, kv)


def test_lower_tlwe_keyswitch_sum():
    t, base_m1, n_in, npad = 2, 3, 16, 128
    nl = 2
    dig = _rand((B, n_in, t), np.int32, hi=base_m1 + 1)
    planes = tuple(_rand((n_in, t, base_m1, npad), np.uint64)
                   .astype(jnp.uint32) for _ in range(nl))
    _lower_tpu(lambda d, *p: pk.tlwe_keyswitch_sum(d, p), dig, *planes)


@pytest.mark.parametrize("mode", ["default", "mxu", "rotntt_mxu"])
def test_lower_blind_rotate_scan_fused(mode):
    kp = _plan(mode)
    acc = _rand((B, C, N))
    a = _rand((2, B), np.int32, hi=2 * N)
    kv = _key(kp, 2, J)
    _lower_tpu(lambda acc, a, kv:
               pk.blind_rotate_scan_fused(acc, a, kv, kv, kp), acc, a, kv)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_ubr_phase1_v2(mode):
    kp = _plan(mode)
    G, M = 2, 8
    su = _rand((2, G, M, J * C, N), np.uint64).astype(jnp.uint32)
    rot = _rand((1, G, M), np.int32, hi=2 * N)
    _lower_tpu(lambda su, rot:
               pk.ubr_phase1_combine_v2(su, rot, kp), su, rot)


@pytest.mark.parametrize("mode", ["default", "mxu"])
def test_lower_ga_scan_fused(mode):
    kp = _plan(mode)
    acc = _rand((B, C, N))
    gens = (_rand((2, B), np.int32, hi=N) * 2 + 1).astype(jnp.int32)
    sv = _key(kp, 2, J)
    Gk = 4
    Jk = (C - 1) * kp.l
    ak = _rand((Gk, Jk * C * kp.P, 1, N), np.uint64,
               hi=min(kp.primes)).astype(jnp.uint32)
    inv2n = jnp.asarray(np.array(
        [pow(x, -1, 2 * N) for x in range(1, 2 * N, 2)], np.int32))
    _lower_tpu(lambda acc, g_, sv_:
               pk.ga_scan_fused(acc, g_, sv_, sv_, ak, inv2n, kp, kp),
               acc, gens, sv)


@pytest.mark.parametrize("NN,ll,bb", [(1024, 2, 8), (4096, 1, 22)])
def test_lower_blind_rotate_scan_fused_other_geometries(NN, ll, bb):
    """Fused whole-scan kernel at SET_1 (N=1024) and SET_3 (N=4096)
    geometries — geometry-specific Mosaic lowering failures must not
    reach the hardware matrix first."""
    CC = 2
    JJ = CC * ll
    bound = _ntt.conv_bound(NN, 1 << (bb - 1), JJ)
    primes = _ntt.primes_for_bound(bound)
    kp = pk.get_kernel_plan(NN, primes, ll, bb, 1, mxu=True)
    acc = _rand((pk.DEFAULT_BT, CC, NN))
    a = _rand((2, pk.DEFAULT_BT), np.int32, hi=2 * NN)
    kv = _rand((2, JJ, CC, kp.P, NN), np.uint64,
               hi=min(kp.primes)).astype(jnp.uint32)
    _lower_tpu(lambda acc, a, kv:
               pk.blind_rotate_scan_fused(acc, a, kv, kv, kp), acc, a, kv)
