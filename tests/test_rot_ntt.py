"""Numeric guards for the MOSFHET_ROT_NTT (rotation-free CMUX) path.

Three layers (per the round-3 advisor findings):
1. `ntt.xpow` must equal the NTT of the monomial X^a for all edge
   exponents, including a = 0, N, 2N.
2. The Pallas kernel's rot-NTT blind-rotate scan must be bit-identical to
   the jnp `_cmux_step_rotntt` scan (interpret mode, MXU plan on and off).
3. End-to-end: a functional bootstrap with MOSFHET_ROT_NTT=1 must still
   decrypt within the standard 2^58 budget (the (X^a - 1) factor grows
   per-step noise variance ~2x — see `_cmux_step_rotntt`'s NOISE note).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mosfhet_tpu import ntt as _ntt
from mosfhet_tpu import bootstrap, params, rng, tlwe, trlwe, trgsw, torus
from mosfhet_tpu.torus import gadget_decompose
from mosfhet_tpu.ops import pbs_kernel as pk


def _monomial_small(a: int, N: int):
    """X^a for a in [0, 2N] as a small int32 polynomial (negacyclic:
    X^N = -1)."""
    m = np.zeros(N, np.int32)
    e, sign = a % N, (-1) ** ((a // N) % 2)
    m[e] = sign
    return jnp.asarray(m)


@pytest.mark.parametrize("N", [64, 256])
def test_xpow_matches_monomial_ntt(N):
    bound = _ntt.external_product_bound(N, 9, 3, 1)
    plan = _ntt.get_plan(N, _ntt.primes_for_bound(bound, N))
    assert plan.barrett_ok
    exps = [0, 1, 3, N - 1, N, N + 1, 2 * N - 1, 2 * N]
    a = jnp.asarray(exps, jnp.int32)
    got = _ntt.xpow(a, plan)                      # [len, P, N]
    want = _ntt.to_ntt_small(
        jnp.stack([_monomial_small(e, N) for e in exps]), plan)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def _rotntt_jnp_scan(acc0, a_int, keyv, keyvs, plan, l, Bg_bit, k, N):
    def step(acc_st, xs):
        bk_v, bk_vs, ai = xs
        return bootstrap._cmux_step_rotntt(
            acc_st, bk_v, bk_vs, ai, plan, l, Bg_bit, k, N), None
    acc, _ = jax.lax.scan(step, acc0, (keyv, keyvs, a_int))
    return acc


@pytest.mark.parametrize("mxu", [False, True])
def test_blind_rotate_scan_rotntt_kernel_eq_jnp(mxu):
    """Interpret-mode bit-identity: kernel rot-NTT scan == jnp
    `_cmux_step_rotntt` scan (the repo invariant extended to the
    rotation-free step)."""
    N, k, l, Bg_bit, n = 256, 1, 2, 9, 5
    C, J = k + 1, (k + 1) * l
    primes = _ntt.primes_for_bound(
        _ntt.external_product_bound(N, Bg_bit, l, k), N)
    plan = _ntt.get_plan(N, primes)
    assert plan.barrett_ok
    P = plan.P
    r = np.random.default_rng(4040 + int(mxu))
    B = 32
    acc0 = jnp.asarray(r.integers(0, 1 << 64, size=(B, C, N),
                                  dtype=np.uint64))
    # incl. the degenerate exponents 0 and 2N (zeta^a - 1 == 0)
    a_np = r.integers(0, 2 * N + 1, size=(n, B), dtype=np.int32)
    a_np[0, 0], a_np[1, 1] = 0, 2 * N
    a_int = jnp.asarray(a_np)
    keyv = jnp.asarray(
        r.integers(0, 1 << 62, size=(n, J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])

    want = _rotntt_jnp_scan(acc0, a_int, keyv, keyvs, plan, l, Bg_bit,
                            k, N)
    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=mxu, rot_ntt=True)
    assert kp.rot_ntt and kp.use_mxu == mxu
    got = pk.blind_rotate_scan(acc0, a_int, keyv.astype(jnp.uint32),
                               keyvs.astype(jnp.uint32), kp,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_bootstrap_rotntt_decrypt(monkeypatch):
    """End-to-end functional bootstrap under MOSFHET_ROT_NTT=1 decrypts
    within the standard budget, and its phase agrees with the classic
    step's output at the noise level."""
    p = params.TOY
    KEY = jax.random.PRNGKey(1212)
    k0, k1, k2, k3, k4 = jax.random.split(KEY, 5)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, key_tlwe, 1)
    assert bk.plan().barrett_ok

    luts = rng.uniform_torus(k3, (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus(jnp.arange(4) / 8.0)
    cs = tlwe.encrypt(ms, key_tlwe, k4)

    monkeypatch.setenv("MOSFHET_ROT_NTT", "0")
    out_classic = bootstrap.functional_bootstrap(tv, cs, bk, 4)
    monkeypatch.setenv("MOSFHET_ROT_NTT", "1")
    assert _ntt.rot_ntt_enabled()
    out_rot = bootstrap.functional_bootstrap(tv, cs, bk, 4)

    for name, out in (("classic", out_classic), ("rotntt", out_rot)):
        ph = jnp.asarray(tlwe.phase(out, key_out), jnp.uint64)
        err = np.abs(np.asarray(ph - luts).view(np.int64)
                     .astype(np.float64))
        assert err.max() <= 2.0**58, \
            f"{name}: max err 2^{np.log2(err.max() + 1):.1f}"
    # the two algorithms agree at the noise level (not bit level)
    d = np.abs(np.asarray(
        jnp.asarray(tlwe.phase(out_rot, key_out), jnp.uint64)
        - jnp.asarray(tlwe.phase(out_classic, key_out), jnp.uint64)
    ).view(np.int64).astype(np.float64))
    assert d.max() <= 2.0**58
