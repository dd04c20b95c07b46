"""Bootstrapping: blind rotation, functional/programmable bootstrap, and the
multi-value variants.

Mirrors `src/bootstrap.c`.  The reference's per-ciphertext CMUX chain
(`blind_rotate`, `bootstrap.c:107-122`) becomes a `lax.scan` over n steps of
the fused batched external product; throughput comes from the leading batch
axis (thousands of independent bootstraps per chip), latency from the scan.

The reference's `if a_i == 0: continue` branch is dropped: X^0 - 1 = 0, so
the dense CMUX contributes exactly zero — a noise-free no-op (the skip is a
CPU branch optimization only).
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

from . import ntt as _ntt
from . import polynomial as _poly
from . import trgsw as _trgsw
from . import trlwe as _trlwe
from .tlwe import TLWE, TLWEKey
from .trgsw import TRGSW, TRGSWDFT, TRGSWKey
from .trlwe import TRLWE, from_stacked
from .torus import TORUS_DTYPE, TORUS_BITS, torus2int, gadget_decompose


@flax.struct.dataclass
class BootstrapKey:
    """unfold=1: NTT-form TRGSW(s_i) stacked over i (`new_bootstrap_key_wo_
    unfolding`, `bootstrap.c:3-21`): v/vs [n, (k+1)l, k+1, P, N].

    unfold=u>1: time-domain TRGSW of key-bit products, grouped
    [n/u, 2^u, (k+1)l, k+1, N] in `su` (`bootstrap.c:23-48`); v/vs unused.
    """
    v: jax.Array | None
    vs: jax.Array | None
    su: jax.Array | None
    n: int = flax.struct.field(pytree_node=False)
    k: int = flax.struct.field(pytree_node=False)
    N: int = flax.struct.field(pytree_node=False)
    l: int = flax.struct.field(pytree_node=False)
    Bg_bit: int = flax.struct.field(pytree_node=False)
    unfolding: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)

    def plan(self):
        return _ntt.get_plan(self.N, self.primes)


def _batched_monomial_encrypt(ms, es, key: TRGSWKey, rkey):
    """TRGSW(m_i X^{e_i}) for arrays of m/e — vmapped keygen."""
    n = ms.shape[0]
    keys = jax.random.split(rkey, n)
    enc = jax.vmap(lambda m, e, rk: _trgsw.monomial_encrypt(m, e, key, rk))
    return enc(jnp.asarray(ms, jnp.int64), jnp.asarray(es, jnp.int32), keys)


def new_key(rkey, out_key: TRGSWKey, in_key: TLWEKey,
            unfolding: int = 1) -> BootstrapKey:
    """Bootstrap key generation (`new_bootstrap_key`, `bootstrap.c:3-48`)."""
    l, Bg_bit = out_key.l, out_key.Bg_bit
    k, N = out_key.trlwe_key.k, out_key.trlwe_key.N
    n = in_key.n
    plan = out_key.plan()
    if unfolding == 1:
        g = _batched_monomial_encrypt(
            in_key.s, jnp.zeros((n,), jnp.int32), out_key, rkey)
        gd = _trgsw.to_dft(g, plan, with_shoup=True)
        return BootstrapKey(v=gd.v, vs=gd.vs, su=None, n=n, k=k, N=N, l=l,
                            Bg_bit=Bg_bit, unfolding=1, primes=plan.primes)
    # unfolded: per u-group, encrypt all 2^u products of key bits / negations
    assert n % unfolding == 0
    key_exp = 1 << unfolding
    s = jnp.asarray(in_key.s, jnp.int64).reshape(n // unfolding, unfolding)
    bits = (jnp.arange(key_exp)[:, None] >> jnp.arange(unfolding)[None, :]) & 1
    # key[g, j] = prod_u (j_u ? s[g,u] : 1 - s[g,u])   (`bootstrap.c:39-43`)
    terms = jnp.where(bits[None], s[:, None, :], 1 - s[:, None, :])
    ms = jnp.prod(terms, axis=-1).reshape(-1)           # [n/u * 2^u]
    g = _batched_monomial_encrypt(
        ms, jnp.zeros_like(ms, jnp.int32), out_key, rkey)
    su = g.rows.reshape(n // unfolding, key_exp, (k + 1) * l, k + 1, N)
    return BootstrapKey(v=None, vs=None, su=su, n=n, k=k, N=N, l=l,
                        Bg_bit=Bg_bit, unfolding=unfolding, primes=plan.primes)


def _cmux_step(acc_st, bk_v, bk_vs, ai, plan, l, Bg_bit, k, N):
    """acc += BK_i (x) (X^{a_i} * acc - acc) — one CMUX (`bootstrap.c:113-118`).
    acc_st: [..., k+1, N] u64; ai: [...] int32; bk_*: [(k+1)l, k+1, P, N].
    """
    rot = _poly.mul_by_xai(acc_st, ai[..., None]) - acc_st
    digits = gadget_decompose(rot, Bg_bit, l)            # [..., k+1, l, N]
    digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
    spec = _ntt.to_ntt_small(digits, plan)               # [..., J, P, N]
    acc_ntt = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], bk_v, bk_vs, plan, axis=-4)
    return acc_st + _ntt.from_ntt_u64(acc_ntt, plan)


def blind_rotate(tv: TRLWE, a, bk: BootstrapKey) -> TRLWE:
    """n-step CMUX chain (`blind_rotate`, `bootstrap.c:107-122`).

    tv: TRLWE accumulator (batched); a: [..., n] u64 LWE mask.
    """
    assert bk.unfolding == 1
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    log_N2 = int(math.log2(2 * N))
    a_int = torus2int(jnp.asarray(a, TORUS_DTYPE), log_N2).astype(jnp.int32)
    a_scan = jnp.moveaxis(a_int, -1, 0)                  # [n, ...]

    def step(acc_st, xs):
        bk_v, bk_vs, ai = xs
        return _cmux_step(acc_st, bk_v, bk_vs, ai, plan, l, Bg_bit, k, N), None

    acc, _ = jax.lax.scan(step, tv.stacked(), (bk.v, bk.vs, a_scan))
    return from_stacked(acc)


def blind_rotate_unfolded(tv: TRLWE, a, bk: BootstrapKey) -> TRLWE:
    """Unfolded blind rotate: per u-group combine 2^u key TRGSWs with
    X^{sum a} rotations, then a single external product
    (`blind_rotate_unfolded`, `bootstrap.c:124-148`)."""
    u = bk.unfolding
    assert u > 1
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    log_N2 = int(math.log2(2 * N))
    key_exp = 1 << u
    a_arr = jnp.asarray(a, TORUS_DTYPE)
    batch = a_arr.shape[:-1]
    a_grp = a_arr.reshape(batch + (bk.n // u, u))
    # rotation amounts per group and mask combination j:
    bits = ((jnp.arange(key_exp)[:, None] >> jnp.arange(u)[None, :]) & 1
            ).astype(TORUS_DTYPE)                        # [2^u, u]
    sums = jnp.sum(a_grp[..., :, None, :] * bits, axis=-1,
                   dtype=TORUS_DTYPE)
    rot = torus2int(sums, log_N2).astype(jnp.int32)      # [..., n/u, 2^u]
    rot_scan = jnp.moveaxis(rot, -2, 0)                  # [n/u, ..., 2^u]

    def step(acc_st, xs):
        su_g, rot_g = xs                                 # [2^u, R, k+1, N], [..., 2^u]
        # xai = su[0] + sum_j su[j] * X^{rot_j}   (j=0 has rot 0)
        rotated = _poly.mul_by_xai(
            su_g, rot_g[..., :, None, None])             # [..., 2^u, R, k+1, N]
        comb = jnp.sum(rotated, axis=-4, dtype=TORUS_DTYPE)
        gd = _ntt.to_ntt_u64(comb, plan)                 # [..., R, k+1, P, N]
        gds = _ntt.make_shoup(gd, plan.p[:, None])
        digits = gadget_decompose(acc_st, Bg_bit, l)
        digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
        spec = _ntt.to_ntt_small(digits, plan)
        acc_ntt = _ntt.pointwise_mul_acc_key(
            spec[..., :, None, :, :], gd, gds, plan, axis=-4)
        return _ntt.from_ntt_u64(acc_ntt, plan), None

    acc, _ = jax.lax.scan(step, tv.stacked(), (bk.su, rot_scan))
    return from_stacked(acc)


def _prec_offset(torus_base: int):
    """double2torus(1/(4*torus_base)) (`bootstrap.c:194`)."""
    return jnp.uint64((1 << 64) // (4 * torus_base))


def functional_bootstrap_wo_extract(tv: TRLWE, c: TLWE, bk: BootstrapKey,
                                    torus_base: int) -> TRLWE:
    """Rotate the test vector by -round(b) then blind-rotate by the mask
    (`functional_bootstrap_wo_extract`, `bootstrap.c:192-198`)."""
    N = bk.N
    log_N2 = int(math.log2(2 * N))
    b_int = torus2int(c.b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
    acc = _trlwe.mul_by_xai(tv, 2 * N - b_int)
    if bk.unfolding == 1:
        return blind_rotate(acc, c.a, bk)
    return blind_rotate_unfolded(acc, c.a, bk)


def functional_bootstrap(tv: TRLWE, c: TLWE, bk: BootstrapKey,
                         torus_base: int) -> TLWE:
    """The programmable bootstrap (`functional_bootstrap`,
    `bootstrap.c:200-206`)."""
    acc = functional_bootstrap_wo_extract(tv, c, bk, torus_base)
    return _trlwe.extract_tlwe(acc, 0)


def programmable_bootstrap(tv: TRLWE, c: TLWE, bk: BootstrapKey,
                           precision: int, kappa: int, theta: int) -> TLWE:
    """Input rounding (kappa shift, theta mask) then bootstrap
    (`programmable_bootstrap`, `bootstrap.c:208-220`)."""
    N = bk.N
    log_N2 = int(math.log2(2 * N))
    rnd_os = jnp.uint64(1 << (TORUS_BITS - log_N2 + theta - 1))
    theta_mask = jnp.uint64(
        (~((1 << (TORUS_BITS - log_N2 + theta)) - 1)) & ((1 << 64) - 1))
    ka = jnp.uint64(kappa)
    a = ((c.a << ka) + rnd_os) & theta_mask
    b = ((c.b << ka) + rnd_os) & theta_mask
    return functional_bootstrap(tv, TLWE(a=a, b=b), bk, 1 << (precision - 1))


# --- multi-value bootstrapping ------------------------------------------------

def multivalue_bootstrap_CLOT21(tv: TRLWE, c: TLWE, bk: BootstrapKey,
                                torus_base: int, n_luts: int) -> list[TLWE]:
    """One blind rotate, many LUT outputs by extraction offset
    (`multivalue_bootstrap_CLOT21`, `bootstrap.c:222-230`)."""
    slot = bk.N // (n_luts * torus_base)
    acc = functional_bootstrap_wo_extract(tv, c, bk, torus_base * n_luts)
    return [_trlwe.extract_tlwe(acc, i * slot) for i in range(n_luts)]


def multivalue_bootstrap_phase1(c: TLWE, bk: BootstrapKey,
                                torus_base: int) -> list[TRLWE]:
    """Blind-rotate a constant test vector once; phase 2 composes any LUT
    as a cleartext combination (`multivalue_bootstrap_phase1`,
    `bootstrap.c:232-243`).  Returns torus_base+1 rotated TRLWEs."""
    N, k = bk.N, bk.k
    const = jnp.full((N,), _prec_offset(torus_base), TORUS_DTYPE)
    tv = _trlwe.noiseless_trivial(const, k, N)
    r0 = functional_bootstrap_wo_extract(tv, c, bk, torus_base)
    out = [r0]
    for i in range(1, torus_base):
        out.append(_trlwe.mul_by_xai(r0, i * N // torus_base))
    last = _trlwe.add(_trlwe.mul_by_xai(r0, torus_base), r0)
    out.append(last)
    return out


def multivalue_bootstrap_phase2(lut_values, rotated: list[TRLWE],
                                torus_base: int, log_torus_base: int) -> TLWE:
    """Compose a LUT from phase-1 rotations by bit-plane
    (`multivalue_bootstrap_phase2`, `bootstrap.c:245-265`).
    lut_values: Python ints (cleartext LUT)."""
    from . import tlwe as _tlwe
    N, k = rotated[0].N, rotated[0].k
    n_out = N * k
    out = _tlwe.noiseless_trivial(jnp.uint64(0), n_out)
    for j in range(log_torus_base):
        w0 = ((lut_values[0] >> j) & 1) + ((lut_values[torus_base - 1] >> j) & 1)
        if w0 == 2:
            tmp = rotated[torus_base]
        elif w0 == 1:
            tmp = rotated[0]
        elif w0 == -1:
            tmp = _trlwe.neg(rotated[0])
        else:
            tmp = _trlwe.noiseless_trivial(
                jnp.zeros((N,), TORUS_DTYPE), k, N)
        for i in range(1, torus_base):
            wi = ((lut_values[i] >> j) & 1) - ((lut_values[i - 1] >> j) & 1)
            if wi == 1:
                tmp = _trlwe.add(tmp, rotated[i])
            elif wi == -1:
                tmp = _trlwe.sub(tmp, rotated[i])
        ext = _trlwe.mv_extract_tlwe_scaling_delta(tmp, 1 << j)
        out = _tlwe.add(out, ext)
    return out


# --- UBR multi-value (`bootstrap.c:151-190`) -----------------------------------

def multivalue_bootstrap_UBR_phase1(c: TLWE, bk: BootstrapKey) -> TRGSWDFT:
    """Cache the per-group combined TRGSW products for reuse across LUTs
    (`multivalue_bootstrap_UBR_phase1`).  Returns batched TRGSW-DFT with a
    leading [n/u] axis (and Shoup companions for phase-2 reuse)."""
    u = bk.unfolding
    assert u > 1
    plan = bk.plan()
    N = bk.N
    log_N2 = int(math.log2(2 * N))
    key_exp = 1 << u
    a_arr = jnp.asarray(c.a, TORUS_DTYPE)
    batch = a_arr.shape[:-1]
    a_grp = a_arr.reshape(batch + (bk.n // u, u))
    bits = ((jnp.arange(key_exp)[:, None] >> jnp.arange(u)[None, :]) & 1
            ).astype(TORUS_DTYPE)
    sums = jnp.sum(a_grp[..., :, None, :] * bits, axis=-1,
                   dtype=TORUS_DTYPE)
    rot = torus2int(sums, log_N2).astype(jnp.int32)      # [..., n/u, 2^u]
    rotated = _poly.mul_by_xai(bk.su, rot[..., :, :, None, None])
    # rotated: [..., n/u, 2^u, R, k+1, N]; combine over the 2^u axis
    comb = jnp.sum(rotated, axis=-4, dtype=TORUS_DTYPE)
    v = _ntt.to_ntt_u64(comb, plan)
    vs = _ntt.make_shoup(v, plan.p[:, None])
    return TRGSWDFT(v=v, vs=vs, l=bk.l, Bg_bit=bk.Bg_bit, primes=bk.primes)


def multivalue_bootstrap_UBR_phase2(tv: TRLWE, c: TLWE, sa: TRGSWDFT,
                                    bk: BootstrapKey, torus_base: int) -> TLWE:
    """Apply the cached products to a fresh test vector
    (`multivalue_bootstrap_UBR_phase2`, `bootstrap.c:176-190`)."""
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    plan = bk.plan()
    log_N2 = int(math.log2(2 * N))
    b_int = torus2int(c.b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
    acc = _trlwe.mul_by_xai(tv, 2 * N - b_int)
    # scan over the n/u cached products (they carry the batch dims)
    ng = bk.n // bk.unfolding
    sa_v = jnp.moveaxis(sa.v, -5, 0)                     # [n/u, ..., R, k+1, P, N]
    sa_vs = jnp.moveaxis(sa.vs, -5, 0)

    def step(acc_st, xs):
        gv, gvs = xs
        digits = gadget_decompose(acc_st, Bg_bit, l)
        digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
        spec = _ntt.to_ntt_small(digits, plan)
        acc_ntt = _ntt.pointwise_mul_acc_key(
            spec[..., :, None, :, :], gv, gvs, plan, axis=-4)
        return _ntt.from_ntt_u64(acc_ntt, plan), None

    acc_st, _ = jax.lax.scan(step, acc.stacked(), (sa_v, sa_vs))
    return _trlwe.extract_tlwe(from_stacked(acc_st), 0)
