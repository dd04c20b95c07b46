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

    kp = pk.get_kernel_plan(p.N, bk.primes, p.l, p.Bg_bit, p.k)
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
