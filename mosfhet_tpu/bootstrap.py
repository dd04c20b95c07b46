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

    unfold=u>1: time-domain TRGSW of key-bit products
    (`bootstrap.c:23-48`), stored as u32 *limb planes*
    [nl, n/u, 2^u, (k+1)l, k+1, N] in `su` (nl = TORUS_BITS/32, plane 0 =
    low limb) — the layout the fused unfolded kernels stream directly, so
    multi-GiB unfold-8 keys never need an extra limb-split copy in HBM.
    `su_u64()` recombines for the portable jnp paths and IO; v/vs unused.
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

    def su_u64(self):
        """Recombine the limb planes to torus values
        [n/u, 2^u, (k+1)l, k+1, N]."""
        if self.su.shape[0] == 1:
            return jnp.asarray(self.su[0], TORUS_DTYPE)
        return (self.su[0].astype(jnp.uint64)
                | (self.su[1].astype(jnp.uint64) << jnp.uint64(32)))


def _split_su_planes(su64):
    """[G, M, R, C, N] torus -> u32 limb planes [nl, G, M, R, C, N]."""
    if TORUS_BITS == 32:
        return jnp.asarray(su64, jnp.uint32)[None]
    lo = (su64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (su64 >> jnp.uint64(32)).astype(jnp.uint32)
    return jnp.stack([lo, hi])


def _batched_monomial_encrypt(ms, es, key: TRGSWKey, rkey):
    """TRGSW(m_i X^{e_i}) for arrays of m/e — vmapped keygen, chunked with
    lax.map so the encryption intermediates (mask NTTs) of multi-GiB keys
    (unfold=8: 20k+ TRGSWs) never exceed HBM."""
    n = ms.shape[0]
    keys = jax.random.split(rkey, n)
    ms = jnp.asarray(ms, jnp.int64)
    es = jnp.asarray(es, jnp.int32)
    enc = jax.vmap(lambda m, e, rk: _trgsw.monomial_encrypt(m, e, key, rk))
    if n <= 1024:
        return enc(ms, es, keys)
    chunk = next(c for c in range(1024, 0, -1) if n % c == 0)
    out = jax.lax.map(
        lambda xs: enc(*xs),
        (ms.reshape(n // chunk, chunk),
         es.reshape(n // chunk, chunk),
         keys.reshape(n // chunk, chunk, -1)))
    return jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), out)


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
    su = _split_su_planes(
        g.rows.reshape(n // unfolding, key_exp, (k + 1) * l, k + 1, N))
    return BootstrapKey(v=None, vs=None, su=su, n=n, k=k, N=N, l=l,
                        Bg_bit=Bg_bit, unfolding=unfolding, primes=plan.primes)


def _pallas_eligible(bk: "BootstrapKey") -> bool:
    """The fused Pallas kernel runs on real TPU devices for power-of-two N
    with all NTT primes in (2^28, 2^30) (`ops/pbs_kernel.kernel_eligible`
    is the single source of truth)."""
    from .ops.pbs_kernel import kernel_eligible
    return kernel_eligible(bk.N, bk.primes)


def _pallas_rotate_flat(acc0, a_int, bk: BootstrapKey, l: int, Bg_bit: int):
    """Run the fused kernel scan on a flat batch.

    acc0: [B, k+1, N] u64; a_int: [B, n] int32 in [0, 2N]."""
    from .ops import pbs_kernel as _pk
    kp = _pk.get_kernel_plan(bk.N, bk.primes, l, Bg_bit, bk.k)
    B = acc0.shape[0]
    pad = (-B) % kp.bt
    if pad:
        acc0 = jnp.concatenate(
            [acc0, jnp.zeros((pad,) + acc0.shape[1:], TORUS_DTYPE)], axis=0)
        a_int = jnp.concatenate(
            [a_int, jnp.zeros((pad, a_int.shape[1]), jnp.int32)], axis=0)
    a_scan = jnp.moveaxis(a_int, -1, 0)                  # [n, B]
    bkv32 = bk.v.astype(jnp.uint32)
    bkvs32 = bk.vs.astype(jnp.uint32)
    acc = _pk.blind_rotate_scan(acc0, a_scan, bkv32, bkvs32, kp)
    return acc[:B] if pad else acc


def _blind_rotate_pallas(tv: TRLWE, a, bk: BootstrapKey) -> TRLWE:
    """Blind rotate with the fused Pallas CMUX kernel (bit-identical to the
    jnp path; see `ops/pbs_kernel.py`)."""
    N, k = bk.N, bk.k
    log_N2 = int(math.log2(2 * N))
    a_arr = jnp.asarray(a, TORUS_DTYPE)
    batch = a_arr.shape[:-1]
    B = 1
    for d in batch:
        B *= d
    acc0 = jnp.broadcast_to(
        tv.stacked(), batch + (k + 1, N)).reshape(B, k + 1, N)
    a_int = torus2int(a_arr.reshape(B, -1), log_N2).astype(jnp.int32)
    acc = _pallas_rotate_flat(acc0, a_int, bk, bk.l, bk.Bg_bit)
    return from_stacked(acc.reshape(batch + (k + 1, N)))


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


def _cmux_step_rotntt(acc_st, bk_v, bk_vs, ai, plan, l, Bg_bit, k, N):
    """Rotation-free CMUX step (MOSFHET_ROT_NTT; same contract as
    `_cmux_step`): the accumulator is gadget-decomposed directly and the
    (X^{a_i} - 1) factor is applied in the NTT domain, where monomial
    multiplication is diagonal (`ntt.xpow`):

        acc += invNTT((zeta^a - 1) ⊙ sum_j NTT(decompose(acc)_j) * KEY_j)

    Exact: rotation commutes with gadget recomposition (it is linear), so
    this equals `_cmux_step` up to the decomposition rounding term, which
    here is scaled by (X^a - 1) — bounded by 2x, covered by the key's
    `ntt.external_product_bound` prime budget.  Bit-identical to the
    Pallas kernel's rot-NTT path.

    NOISE: the (X^a - 1) factor also scales the TRGSW key-noise term
    sum_j d_j * e_j, so per-step external-product noise VARIANCE grows by
    up to ~2x vs the classic step (|X^a - 1| has two unit taps).  The 2x
    prime budget covers CRT exactness only, not this TFHE noise growth —
    i.e. rot-NTT costs up to half a bit of output noise margin.  Guarded
    by a decrypt-verified end-to-end test (tests/test_rot_ntt.py) and by
    the hardware bench's decrypt check; do not flip MOSFHET_ROT_NTT on by
    default without re-checking the target parameter set's budget."""
    digits = gadget_decompose(acc_st, Bg_bit, l)         # [..., k+1, l, N]
    digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
    spec = _ntt.to_ntt_small(digits, plan)               # [..., J, P, N]
    acc_ntt = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], bk_v, bk_vs, plan, axis=-4)
    # t = zeta^a - 1 (canonical; zeta^a is a root power, never 0)
    t = _ntt.xpow(ai, plan) - jnp.uint64(1)              # [..., P, N]
    acc_ntt = _ntt.barrett_mul(acc_ntt, t[..., None, :, :], plan)
    return acc_st + _ntt.from_ntt_u64(acc_ntt, plan)


def blind_rotate(tv: TRLWE, a, bk: BootstrapKey, impl: str = "auto") -> TRLWE:
    """n-step CMUX chain (`blind_rotate`, `bootstrap.c:107-122`).

    tv: TRLWE accumulator (batched); a: [..., n] u64 LWE mask.
    impl: "auto" picks the fused Pallas TPU kernel on TPU devices and the
    portable jnp path elsewhere; both are exact and bit-identical.
    MOSFHET_ROT_NTT=1 switches both to the rotation-free step
    (`_cmux_step_rotntt`) on Barrett-capable prime sets.
    """
    assert bk.unfolding == 1
    if impl == "auto":
        impl = "pallas" if _pallas_eligible(bk) else "jnp"
    if impl == "pallas":
        return _blind_rotate_pallas(tv, a, bk)
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    log_N2 = int(math.log2(2 * N))
    a_int = torus2int(jnp.asarray(a, TORUS_DTYPE), log_N2).astype(jnp.int32)
    a_scan = jnp.moveaxis(a_int, -1, 0)                  # [n, ...]
    step_fn = _cmux_step_rotntt if (_ntt.rot_ntt_enabled()
                                    and plan.barrett_ok) else _cmux_step

    def step(acc_st, xs):
        bk_v, bk_vs, ai = xs
        return step_fn(acc_st, bk_v, bk_vs, ai, plan, l, Bg_bit, k, N), None

    acc, _ = jax.lax.scan(step, tv.stacked(), (bk.v, bk.vs, a_scan))
    return from_stacked(acc)


def _unfold_rotations(a_arr, bk: BootstrapKey):
    """Per-group, per-mask-combination rotation exponents
    (`bootstrap.c:128-136`): rot[..., g, m] = round((sum_{i in m} a[g*u+i])
    * 2N / 2^TB), int32 in [0, 2N]."""
    u = bk.unfolding
    log_N2 = int(math.log2(2 * bk.N))
    key_exp = 1 << u
    batch = a_arr.shape[:-1]
    a_grp = a_arr.reshape(batch + (bk.n // u, u))
    bits = ((jnp.arange(key_exp)[:, None] >> jnp.arange(u)[None, :]) & 1
            ).astype(TORUS_DTYPE)                        # [2^u, u]
    sums = jnp.sum(a_grp[..., :, None, :] * bits, axis=-1,
                   dtype=TORUS_DTYPE)
    return torus2int(sums, log_N2).astype(jnp.int32)     # [..., n/u, 2^u]


def _blind_rotate_unfolded_pallas(tv: TRLWE, a, bk: BootstrapKey,
                                  interpret: bool = False) -> TRLWE:
    """Unfolded blind rotate via the single fused Pallas kernel
    (`ops/pbs_kernel.unfolded_rotate`) — bit-identical to the jnp path."""
    from .ops import pbs_kernel as _pk
    N, k = bk.N, bk.k
    kp = _pk.get_kernel_plan(N, bk.primes, bk.l, bk.Bg_bit, k)
    a_arr = jnp.asarray(a, TORUS_DTYPE)
    st = tv.stacked()
    batch = jnp.broadcast_shapes(a_arr.shape[:-1], st.shape[:-2])
    B = 1
    for d in batch:
        B *= d
    acc0 = jnp.broadcast_to(st, batch + (k + 1, N)).reshape(B, k + 1, N)
    a_full = jnp.broadcast_to(a_arr, batch + a_arr.shape[-1:])
    rot = _unfold_rotations(a_full.reshape(B, -1), bk)   # [B, G, M]
    pad = (-B) % kp.bt
    if pad:
        acc0 = jnp.concatenate(
            [acc0, jnp.zeros((pad,) + acc0.shape[1:], TORUS_DTYPE)], axis=0)
        rot = jnp.concatenate(
            [rot, jnp.zeros((pad,) + rot.shape[1:], jnp.int32)], axis=0)
    R = (bk.k + 1) * bk.l
    su_planes = bk.su.reshape(bk.su.shape[0], bk.n // bk.unfolding,
                              1 << bk.unfolding, R * (bk.k + 1), bk.N)
    acc = _pk.unfolded_rotate(acc0, rot, su_planes, kp, interpret=interpret)
    acc = acc[:B] if pad else acc
    return from_stacked(acc.reshape(batch + (k + 1, N)))


def blind_rotate_unfolded(tv: TRLWE, a, bk: BootstrapKey,
                          impl: str = "auto") -> TRLWE:
    """Unfolded blind rotate: per u-group combine 2^u key TRGSWs with
    X^{sum a} rotations, then a single external product
    (`blind_rotate_unfolded`, `bootstrap.c:124-148`).

    impl "auto" picks the fused Pallas kernel on TPU (the whole scan is one
    pallas_call; see `ops/pbs_kernel.unfolded_rotate`), jnp elsewhere; both
    are exact and bit-identical."""
    u = bk.unfolding
    assert u > 1
    if impl == "auto":
        impl = "pallas" if _pallas_eligible(bk) else "jnp"
    if impl in ("pallas", "pallas_interpret"):
        return _blind_rotate_unfolded_pallas(
            tv, a, bk, interpret=(impl == "pallas_interpret"))
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    key_exp = 1 << u
    a_arr = jnp.asarray(a, TORUS_DTYPE)
    batch = a_arr.shape[:-1]
    rot = _unfold_rotations(a_arr, bk)                   # [..., n/u, 2^u]
    rot_scan = jnp.moveaxis(rot, -2, 0)                  # [n/u, ..., 2^u]

    def step(acc_st, xs):
        su_g, rot_g = xs                                 # [2^u, R, k+1, N], [..., 2^u]
        # xai = su[0] + sum_j su[j] * X^{rot_j}   (j=0 has rot 0)
        rotated = _poly.mul_by_xai(
            su_g, rot_g[..., :, None, None])             # [..., 2^u, R, k+1, N]
        comb = jnp.sum(rotated, axis=-4, dtype=TORUS_DTYPE)
        gd = _ntt.to_ntt_u64(comb, plan)                 # [..., R, k+1, P, N]
        digits = gadget_decompose(acc_st, Bg_bit, l)
        digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
        spec = _ntt.to_ntt_small(digits, plan)
        # both operands dynamic: division-free Barrett mul-acc
        acc_ntt = _ntt.pointwise_mul_acc_generic(
            spec[..., :, None, :, :], gd, plan, axis=-4)
        return _ntt.from_ntt_u64(acc_ntt, plan), None

    acc, _ = jax.lax.scan(step, tv.stacked(), (bk.su_u64(), rot_scan))
    return from_stacked(acc)


def _prec_offset(torus_base: int):
    """double2torus(1/(4*torus_base)) (`bootstrap.c:194`)."""
    return TORUS_DTYPE((1 << TORUS_BITS) // (4 * torus_base))


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
    rnd_os = TORUS_DTYPE(1 << (TORUS_BITS - log_N2 + theta - 1))
    theta_mask = TORUS_DTYPE(
        (~((1 << (TORUS_BITS - log_N2 + theta)) - 1)) & ((1 << TORUS_BITS) - 1))
    ka = TORUS_DTYPE(kappa)
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


def _phase2_weights(lut_values, torus_base: int, log_torus_base: int):
    """Per-bit-plane rotation weights of the phase-2 composition
    (`bootstrap.c:245-265`): returns [(j, i, w)] with w in {-1, +1}
    (w0 == 2 maps to weight 1 on rotated[torus_base] = r0*X^tb + r0)."""
    terms = []
    for j in range(log_torus_base):
        w0 = ((lut_values[0] >> j) & 1) + \
            ((lut_values[torus_base - 1] >> j) & 1)
        if w0 == 2:
            terms.append((j, torus_base, 1))
        elif w0 != 0:
            terms.append((j, 0, w0))
        for i in range(1, torus_base):
            wi = ((lut_values[i] >> j) & 1) - ((lut_values[i - 1] >> j) & 1)
            if wi != 0:
                terms.append((j, i, wi))
    return terms


def multivalue_bootstrap_phase2(lut_values, rotated: list[TRLWE],
                                torus_base: int, log_torus_base: int) -> TLWE:
    """Compose a LUT from phase-1 rotations by bit-plane
    (`multivalue_bootstrap_phase2`, `bootstrap.c:245-265`).
    lut_values: Python ints (cleartext LUT).

    Extraction-first reordering (exact: extraction and negation are linear
    in wraparound u64): out = sum_{j,i} w[j,i] * E_j(rotated[i]) instead of
    E_j(sum_i w[j,i] rotated[i]).  The E_j(rotated[i]) extractions are
    LUT-independent, so when many LUTs are composed in one jitted program
    XLA CSEs the (log_tb x (tb+1)) gathers and each extra LUT costs only a
    few [*, k*N] adds — this is what brings the per-LUT compose under the
    reference's 7 us (it re-extracts per LUT; we cannot share in its
    order either)."""
    from . import tlwe as _tlwe
    out = None
    for j, i, w in _phase2_weights(lut_values, torus_base, log_torus_base):
        e = _trlwe.mv_extract_tlwe_scaling_delta(rotated[i], 1 << j)
        t = _tlwe.neg(e) if w < 0 else e
        out = t if out is None else _tlwe.add(out, t)
    if out is None:
        n_out = rotated[0].N * rotated[0].k
        out = _tlwe.noiseless_trivial(
            jnp.zeros(rotated[0].b.shape[:-1], TORUS_DTYPE), n_out)
    return out


def multivalue_bootstrap_phase2_many(lut_tables, rotated: list[TRLWE],
                                     torus_base: int,
                                     log_torus_base: int) -> TLWE:
    """Vectorized phase 2: compose MANY cleartext LUTs from one phase-1
    result in one shot (TPU-first addition — the per-LUT
    `multivalue_bootstrap_phase2` is dispatch-bound when K is large).

    lut_tables: [K, torus_base] Python ints.  Returns TLWE with a leading
    K axis (before the phase-1 batch dims).  Same math as K calls of
    `multivalue_bootstrap_phase2` (`bootstrap.c:245-265`).

    Extraction-first (see `multivalue_bootstrap_phase2`): the
    log_tb x (tb+1) extractions are computed once and every LUT is a
    {-1,0,1}-weighted sum of them — O(K) cheap adds instead of O(K)
    full-polynomial gathers."""
    from . import tlwe as _tlwe
    import numpy as np
    K = len(lut_tables)
    tb = torus_base
    # weights per bit-plane j, LUT, and rotation index — in {-1, 0, 1}
    # after folding w0 == 2 onto rotated[tb]
    w = np.zeros((log_torus_base, K, tb + 1), np.int64)
    for ki, lv in enumerate(lut_tables):
        for j, i, wi in _phase2_weights(lv, tb, log_torus_base):
            w[j, ki, i] = wi
    out_a = out_b = None
    for j in range(log_torus_base):
        for i in range(tb + 1):
            if not np.any(w[j, :, i]):
                continue
            e = _trlwe.mv_extract_tlwe_scaling_delta(rotated[i], 1 << j)
            wj = jnp.asarray(w[j, :, i], np.int64).astype(TORUS_DTYPE)
            sa = wj.reshape((K,) + (1,) * e.a.ndim)      # [K, ...1]
            sb = wj.reshape((K,) + (1,) * e.b.ndim)
            ta = sa * e.a[None]
            tbv = sb * e.b[None]
            out_a = ta if out_a is None else out_a + ta
            out_b = tbv if out_b is None else out_b + tbv
    if out_a is None:
        n_out = rotated[0].N * rotated[0].k
        z = _tlwe.noiseless_trivial(
            jnp.zeros((K,) + rotated[0].b.shape[:-1], TORUS_DTYPE), n_out)
        return z
    return _tlwe.TLWE(a=out_a, b=out_b)


# --- UBR multi-value (`bootstrap.c:151-190`) -----------------------------------

def multivalue_bootstrap_UBR_phase1(c: TLWE, bk: BootstrapKey,
                                    impl: str = "auto") -> TRGSWDFT:
    """Cache the per-group combined TRGSW products for reuse across LUTs
    (`multivalue_bootstrap_UBR_phase1`).  Returns batched TRGSW-DFT with a
    leading [n/u] axis.

    On TPU the rotate+combine+NTT runs in the fused phase-1 Pallas kernel
    (`ops/pbs_kernel.ubr_phase1_combine`), producing u32 residues with no
    Shoup companions (phase 2's kernel multiplies with Barrett); the jnp
    path produces u64 residues + companions.  Values are bit-identical."""
    u = bk.unfolding
    assert u > 1
    plan = bk.plan()
    a_arr = jnp.asarray(c.a, TORUS_DTYPE)
    if impl == "auto":
        impl = "pallas" if _pallas_eligible(bk) else "jnp"
    if impl in ("pallas", "pallas_interpret"):
        from .ops import pbs_kernel as _pk
        kp = _pk.get_kernel_plan(bk.N, bk.primes, bk.l, bk.Bg_bit, bk.k)
        batch = a_arr.shape[:-1]
        B = 1
        for d in batch:
            B *= d
        rot = _unfold_rotations(a_arr.reshape(B, -1), bk)  # [B, G, M]
        G = bk.n // u
        su_planes = bk.su.reshape(
            bk.su.shape[0], G, 1 << u, (bk.k + 1) * bk.l * (bk.k + 1), bk.N)
        import os as _os
        # DEFAULT since round 5: v2 measured 72.6 ms/ct at u=8 (v1 was
        # ~130 at BT=32, and at the BT=64 default v1's group-tiled kernel
        # exceeds the 100 MB scoped-vmem limit outright)
        if _os.environ.get("MOSFHET_UBR_V2", "1") == "1":
            # streaming combine: scalar dynamic roll per mask combination
            # (groups on the grid) — measured alternative to the
            # group-on-sublanes per-row rotation network
            v = _pk.ubr_phase1_combine_v2(
                su_planes, rot, kp,
                interpret=(impl == "pallas_interpret"))
        else:
            su_t = _pk.tile_su_planes(su_planes, kp)
            rot_t = _pk.tile_rot(rot, kp, G)
            sa_t = _pk.ubr_phase1_combine(
                su_t, rot_t, kp, interpret=(impl == "pallas_interpret"))
            v = _pk.merge_phase1_out(sa_t, G)        # [B, G, J, C, P, N]
        v = v.reshape(batch + v.shape[1:])
        return TRGSWDFT(v=v, vs=None, l=bk.l, Bg_bit=bk.Bg_bit,
                        primes=bk.primes)
    rot = _unfold_rotations(a_arr, bk)                   # [..., n/u, 2^u]
    rotated = _poly.mul_by_xai(bk.su_u64(), rot[..., :, :, None, None])
    # rotated: [..., n/u, 2^u, R, k+1, N]; combine over the 2^u axis
    comb = jnp.sum(rotated, axis=-4, dtype=TORUS_DTYPE)
    v = _ntt.to_ntt_u64(comb, plan)
    vs = _ntt.make_shoup(v, plan.p[:, None])
    return TRGSWDFT(v=v, vs=vs, l=bk.l, Bg_bit=bk.Bg_bit, primes=bk.primes)


def _ubr_phase2_pallas(acc: TRLWE, sa: TRGSWDFT, bk: BootstrapKey,
                       interpret: bool = False) -> TLWE:
    """Phase-2 apply scan on the fused kernel: one ciphertext's cached sa
    (unbatched, [G, J, C, P, N]) applied to a batch of test vectors."""
    from .ops import pbs_kernel as _pk
    N, k = bk.N, bk.k
    kp = _pk.get_kernel_plan(N, bk.primes, bk.l, bk.Bg_bit, k)
    acc_st = acc.stacked()
    batch = acc_st.shape[:-2]
    B = 1
    for d in batch:
        B *= d
    acc0 = acc_st.reshape(B, k + 1, N)
    pad = (-B) % kp.bt
    if pad:
        acc0 = jnp.concatenate(
            [acc0, jnp.zeros((pad,) + acc0.shape[1:], TORUS_DTYPE)], axis=0)
    sa32 = sa.v.astype(jnp.uint32)
    out = _pk.ext_product_apply_scan(acc0, sa32, kp, per_row=False,
                                     interpret=interpret)
    out = out[:B] if pad else out
    return _trlwe.extract_tlwe(
        from_stacked(out.reshape(batch + (k + 1, N))), 0)


def multivalue_bootstrap_UBR_phase2(tv: TRLWE, c: TLWE, sa: TRGSWDFT,
                                    bk: BootstrapKey, torus_base: int,
                                    impl: str = "auto") -> TLWE:
    """Apply the cached products to a fresh test vector
    (`multivalue_bootstrap_UBR_phase2`, `bootstrap.c:176-190`).

    The amortized many-LUT mode: `tv` carries the LUT batch, `c`/`sa` are a
    single ciphertext's cache.  On TPU the scan of replace-mode external
    products runs in the fused apply kernel with Barrett multiplies."""
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    plan = bk.plan()
    log_N2 = int(math.log2(2 * N))
    b_int = torus2int(c.b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
    acc = _trlwe.mul_by_xai(tv, 2 * N - b_int)
    sa_unbatched = sa.v.ndim == 5
    if impl == "auto":
        impl = ("pallas" if _pallas_eligible(bk) and sa_unbatched
                else "jnp")
    if impl in ("pallas", "pallas_interpret"):
        assert sa_unbatched, "kernel phase 2 needs an unbatched sa cache"
        return _ubr_phase2_pallas(acc, sa, bk,
                                  interpret=(impl == "pallas_interpret"))
    # scan over the n/u cached products (they carry the batch dims)
    sa_v = jnp.moveaxis(sa.v, -5, 0)                     # [n/u, ..., R, k+1, P, N]
    if sa.vs is None:
        sa_v = sa_v.astype(TORUS_DTYPE)
        sa_vs = _ntt.make_shoup(sa_v, plan.p[:, None])
    else:
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


# =========================================================================
# TRGSW-accumulator blind rotate (`bootstrap.c:267-306`)
# =========================================================================

def blind_rotate_trgsw(tv: TRGSW, a, bk: BootstrapKey,
                       impl: str = "auto") -> TRGSW:
    """CMUX chain on a TRGSW accumulator (`blind_rotate_trgsw`).
    Rows act as a batch axis for the external products."""
    assert bk.unfolding == 1
    if impl == "auto":
        impl = ("pallas" if _pallas_eligible(bk) and tv.l == bk.l
                and tv.Bg_bit == bk.Bg_bit else "jnp")
    if impl == "pallas":
        N, k = bk.N, bk.k
        log_N2 = int(math.log2(2 * N))
        rows = tv.rows
        batch = rows.shape[:-3]
        R = rows.shape[-3]
        B = 1
        for d in batch:
            B *= d
        acc0 = rows.reshape(B * R, k + 1, N)
        a_arr = jnp.asarray(a, TORUS_DTYPE)
        a_int = torus2int(
            jnp.broadcast_to(a_arr, batch + a_arr.shape[-1:]).reshape(B, -1),
            log_N2).astype(jnp.int32)
        a_int = jnp.repeat(a_int, R, axis=0)            # same a per row
        acc = _pallas_rotate_flat(acc0, a_int, bk, tv.l, tv.Bg_bit)
        return TRGSW(rows=acc.reshape(batch + (R, k + 1, N)),
                     l=tv.l, Bg_bit=tv.Bg_bit)
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, tv.l, tv.Bg_bit
    log_N2 = int(math.log2(2 * N))
    a_int = torus2int(jnp.asarray(a, TORUS_DTYPE), log_N2).astype(jnp.int32)
    a_scan = jnp.moveaxis(a_int, -1, 0)

    def step(rows, xs):
        bk_v, bk_vs, ai = xs
        rot = _poly.mul_by_xai(rows, ai[..., None, None]) - rows
        digits = gadget_decompose(rot, Bg_bit, l)        # [..., R, k+1, l, N]
        digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
        spec = _ntt.to_ntt_small(digits, plan)
        acc = _ntt.pointwise_mul_acc_key(
            spec[..., :, None, :, :], bk_v, bk_vs, plan, axis=-4)
        return rows + _ntt.from_ntt_u64(acc, plan), None

    rows, _ = jax.lax.scan(step, tv.rows, (bk.v, bk.vs, a_scan))
    return TRGSW(rows=rows, l=tv.l, Bg_bit=tv.Bg_bit)


def functional_bootstrap_trgsw_phase1(c: TLWE, bk: BootstrapKey,
                                      torus_base: int, l: int,
                                      Bg_bit: int) -> TRGSWDFT:
    """Blind-rotate a trivial TRGSW(1) to get TRGSW(X^-phase)
    (`functional_bootstrap_trgsw_phase1`, `bootstrap.c:285-295`)."""
    N, k = bk.N, bk.k
    log_N2 = int(math.log2(2 * N))
    tv = _trgsw.noiseless_trivial(1, l, Bg_bit, k, N)
    b_int = torus2int(c.b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
    tv = _trgsw.mul_by_xai(tv, 2 * N - b_int)
    rot = blind_rotate_trgsw(tv, c.a, bk)
    g = _trgsw.to_dft(rot, bk.plan(), with_shoup=True)
    return g


def functional_bootstrap_trgsw_phase2(g: TRGSWDFT, tv: TRLWE) -> TLWE:
    """One external product against any test vector
    (`functional_bootstrap_trgsw_phase2`, `bootstrap.c:297-306`)."""
    out = _trgsw.external_product(tv, g)
    return _trlwe.extract_tlwe(out, 0)


# =========================================================================
# circuit bootstrap: TLWE -> TRGSW (`bootstrap.c:309-366`)
# =========================================================================

def _gadget_h(i: int, Bg_bit: int):
    return TORUS_DTYPE(1 << (TORUS_BITS - (i + 1) * Bg_bit))


def circuit_bootstrap(c: TLWE, bk: BootstrapKey, kska, kskb,
                      l: int, Bg_bit: int) -> TRGSW:
    """v1: l functional bootstraps + priv-KS/packing1-KS per level
    (`circuit_bootstrap`, `bootstrap.c:309-322`).  k must be 1."""
    from . import keyswitch as _ks
    assert bk.k == 1
    rows_a, rows_b = [], []
    for i in range(l):
        lut = jnp.array([0, _gadget_h(i, Bg_bit)], dtype=TORUS_DTYPE)
        tv = _trlwe.torus_packing(lut, bk.k, bk.N)
        tmp = functional_bootstrap(tv, c, bk, 2)
        rows_a.append(_ks.priv_keyswitch(tmp, kska).stacked())
        rows_b.append(_ks.packing1_keyswitch(tmp, kskb).stacked())
    rows = jnp.stack(rows_a + rows_b, axis=-3)
    return TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)


def circuit_bootstrap_2(c: TLWE, bk: BootstrapKey, kska, kskb,
                        l: int, Bg_bit: int) -> TRGSW:
    """v2: single many-LUT bootstrap, then KS per level
    (`circuit_bootstrap_2`, `bootstrap.c:324-344`)."""
    from . import keyswitch as _ks
    assert bk.k == 1
    slot = bk.N // (2 * l)
    lut = jnp.concatenate([
        jnp.zeros((l,), TORUS_DTYPE),
        jnp.array([_gadget_h(i, Bg_bit) for i in range(l)], TORUS_DTYPE),
    ])
    tv = _trlwe.torus_packing(lut, bk.k, bk.N)
    acc = functional_bootstrap_wo_extract(tv, c, bk, 2 * l)
    rows_a, rows_b = [], []
    for i in range(l):
        tmp = _trlwe.extract_tlwe(acc, i * slot)
        rows_a.append(_ks.priv_keyswitch(tmp, kska).stacked())
        rows_b.append(_ks.packing1_keyswitch(tmp, kskb).stacked())
    rows = jnp.stack(rows_a + rows_b, axis=-3)
    return TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)


def circuit_bootstrap_3(c: TLWE, bk: BootstrapKey, kska_pair, kskb,
                        l: int, Bg_bit: int) -> TRGSW:
    """v3: KS-based using the TRLWE priv-KS pair
    (`circuit_bootstrap_3`, `bootstrap.c:346-366`)."""
    from . import keyswitch as _ks
    assert bk.k == 1
    slot = bk.N // (2 * l)
    lut = jnp.concatenate([
        jnp.zeros((l,), TORUS_DTYPE),
        jnp.array([_gadget_h(i, Bg_bit) for i in range(l)], TORUS_DTYPE),
    ])
    tv = _trlwe.torus_packing(lut, bk.k, bk.N)
    acc = functional_bootstrap_wo_extract(tv, c, bk, 2 * l)
    rows_a, rows_b = [], []
    for i in range(l):
        tmp = _trlwe.extract_tlwe(acc, i * slot)
        b_row = _ks.packing1_keyswitch(tmp, kskb)
        rows_b.append(b_row.stacked())
        rows_a.append(_ks.priv_keyswitch_2(b_row, kska_pair).stacked())
    rows = jnp.stack(rows_a + rows_b, axis=-3)
    return TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)


# =========================================================================
# public mux + full-domain functional bootstraps (`bootstrap.c:368-538`)
# =========================================================================

def public_mux(p0, p1, selector_v, l: int, Bg_bit: int, k: int, N: int,
               primes) -> TRLWE:
    """out = {p0, p1}[selector]: decompose the cleartext difference and
    accumulate against the TRLWE-DFT selector rows
    (`public_mux`, `bootstrap.c:368-389`).

    p0, p1: [..., N] u64 cleartext; selector_v: [..., l, k+1, P, N]."""
    plan = _ntt.get_plan(N, primes)
    p = jnp.asarray(p1, TORUS_DTYPE) - jnp.asarray(p0, TORUS_DTYPE)
    dec = gadget_decompose(p, Bg_bit, l, rounded=False)   # [..., l, N]
    spec = _ntt.to_ntt_small(dec, plan)                   # [..., l, P, N]
    prods = _ntt.pointwise_mul(selector_v, spec[..., :, None, :, :], plan)
    acc = prods[..., 0, :, :, :]
    for i in range(1, l):
        acc = _ntt.add(acc, prods[..., i, :, :, :], plan)
    out = from_stacked(_ntt.from_ntt_u64(acc, plan))
    return TRLWE(a=out.a, b=out.b + jnp.asarray(p0, TORUS_DTYPE))


def fdfb_ks21(tv_poly, c: TLWE, bk: BootstrapKey, ksk, torus_base: int,
              use_many_lut: bool = True) -> TLWE:
    """Full-domain functional bootstrap, KS21 style: bootstrap the
    decomposed sign, public-mux the folded test vector, bootstrap again
    (`full_domain_functional_bootstrap_KS21{,_2}`, `bootstrap.c:391-454`).

    tv_poly: [2N] u64 cleartext test vector covering the full domain
    (`tests.c:1076-1077`)."""
    from . import keyswitch as _ks
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    plan = bk.plan()

    sel_rows = []
    if use_many_lut:
        slot = N // (l * torus_base // 2)
        lut = jnp.array(
            [TORUS_DTYPE(0) - (_gadget_h(i, Bg_bit) >> TORUS_DTYPE(1))
             for i in range(l) for _ in range(torus_base // 2)], TORUS_DTYPE)
        # sign value per level: -(h_i / 2)
        tv1 = _trlwe.torus_packing_many_lut(lut, torus_base // 2, l, k, N)
        acc = functional_bootstrap_wo_extract(tv1, c, bk, l * torus_base // 2)
        for i in range(l):
            sign = TORUS_DTYPE(0) - (_gadget_h(i, Bg_bit) >> TORUS_DTYPE(1))
            tmp = _trlwe.extract_tlwe(acc, i * slot)
            tmp = TLWE(a=tmp.a, b=tmp.b - sign)
            sel_rows.append(_ks.packing1_keyswitch(tmp, ksk))
    else:
        for i in range(l):
            sign = TORUS_DTYPE(0) - (_gadget_h(i, Bg_bit) >> TORUS_DTYPE(1))
            tv1 = _trlwe.torus_packing(jnp.array([sign], TORUS_DTYPE), k, N)
            tmp = functional_bootstrap(tv1, c, bk, torus_base // 2)
            tmp = TLWE(a=tmp.a, b=tmp.b - sign)
            sel_rows.append(_ks.packing1_keyswitch(tmp, ksk))
    sel_v = jnp.stack(
        [_ntt.to_ntt_u64(r.stacked(), plan) for r in sel_rows], axis=-4)

    tvp = jnp.asarray(tv_poly, TORUS_DTYPE)
    assert tvp.shape[-1] == 2 * N
    p0 = tvp[..., :N]
    p1 = TORUS_DTYPE(0) - tvp[..., N:]
    muxed = public_mux(p0, p1, sel_v, l, Bg_bit, k, N, bk.primes)
    return functional_bootstrap(muxed, c, bk, torus_base // 2)


def fdfb_clot21(tv0: TRLWE, tv1: TRLWE, c: TLWE, bk: BootstrapKey, ksk, rlk,
                precision: int) -> TLWE:
    """FDFB via f0/f1/sign products (`full_domain_functional_bootstrap_
    CLOT21`, `bootstrap.c:456-481`)."""
    from . import tlwe as _tlwe
    from .product import tlwe_mul
    N, k = bk.N, bk.k
    sign = TORUS_DTYPE(1 << (TORUS_BITS - precision - 1))
    tv_sign = _trlwe.torus_packing(jnp.array([sign], TORUS_DTYPE), k, N)
    tb = 1 << (precision - 1)
    ct_f0 = functional_bootstrap(tv0, c, bk, tb)
    ct_f1 = functional_bootstrap(tv1, c, bk, tb)
    ct_sign = functional_bootstrap(tv_sign, c, bk, tb)
    s_minus = TLWE(a=ct_sign.a, b=ct_sign.b - sign)
    ct_f1 = tlwe_mul(ct_f1, s_minus, precision, ksk, rlk)
    s_plus = TLWE(a=s_minus.a, b=s_minus.b + sign + sign)
    ct_f0 = tlwe_mul(ct_f0, s_plus, precision, ksk, rlk)
    return _tlwe.add(ct_f0, ct_f1)


def fdfb_clot21_2(tv_values, c: TLWE, bk: BootstrapKey, ksk, rlk,
                  precision: int) -> TLWE:
    """Single-blind-rotate CLOT21 FDFB (`bootstrap.c:483-517`).
    tv_values: [2*torus_base] u64 cleartext (f0 then f1 halves)."""
    from . import tlwe as _tlwe
    from .product import tlwe_mul
    N, k = bk.N, bk.k
    torus_base = 1 << (precision - 2)
    slot = N // (4 * torus_base)
    sign = TORUS_DTYPE(1 << (TORUS_BITS - precision - 1))
    lut = jnp.concatenate([
        jnp.asarray(tv_values, TORUS_DTYPE),
        jnp.full((torus_base,), sign, TORUS_DTYPE),
        jnp.zeros((torus_base,), TORUS_DTYPE),
    ])
    tv = _trlwe.torus_packing_many_lut(lut, torus_base, 4, k, N)
    acc = functional_bootstrap_wo_extract(tv, c, bk, 4 * torus_base)
    ct_f0 = _trlwe.extract_tlwe(acc, 0)
    ct_f1 = _trlwe.extract_tlwe(acc, slot)
    ct_sign = _trlwe.extract_tlwe(acc, 2 * slot)
    s_minus = TLWE(a=ct_sign.a, b=ct_sign.b - sign)
    ct_f1 = tlwe_mul(ct_f1, s_minus, precision, ksk, rlk)
    s_plus = TLWE(a=s_minus.a, b=s_minus.b + sign + sign)
    ct_f0 = tlwe_mul(ct_f0, s_plus, precision, ksk, rlk)
    return _tlwe.add(ct_f0, ct_f1)


def fdfb_this_work(tv: TRLWE, c: TLWE, bk: BootstrapKey, tlwe_ksk,
                   precision: int) -> TLWE:
    """FDFB "this work": sign bootstrap -> add to input -> half-domain
    bootstrap (`full_domain_functional_bootstrap`, `bootstrap.c:519-538`)."""
    from . import tlwe as _tlwe
    N, k = bk.N, bk.k
    sign = TORUS_DTYPE(((1 << (TORUS_BITS - 2))
                        - (1 << (TORUS_BITS - precision - 2)))
                       & ((1 << TORUS_BITS) - 1))
    tv_sign = _trlwe.torus_packing(jnp.array([sign], TORUS_DTYPE), k, N)
    ct_sign = functional_bootstrap(tv_sign, c, bk, 1 << (precision - 1))
    ct_sign = TLWE(a=ct_sign.a, b=ct_sign.b - sign)
    in2 = _tlwe.keyswitch(ct_sign, tlwe_ksk)
    in2 = _tlwe.add(in2, c)
    return functional_bootstrap(tv, in2, bk, 1 << precision)
