"""Cross-chip coefficient-sharded (N-sharded) negacyclic NTT.

The single-chip transforms keep the whole length-N polynomial on one
device (`ntt.py`, `ops/pbs_kernel.py`); for ring dimensions beyond one
chip's VMEM/HBM sweet spot (N >= 16384, SURVEY.md §5 "long-context
analog") the coefficient axis itself must be sharded over the mesh with
collectives between butterfly stages — the TP/SP-shaped piece of the
design (SURVEY.md §2.2).

Factorization (four-step / Bailey): with D devices and N = D * N2, view
the coefficient index i = i1*N2 + i2 as a [D, N2] matrix sharded on i1.

  negacyclic fold:  x[i] *= psi^i                      (local twist)
  step 1:           DFT_D over i1  (root w^N2)         <- D-point DFT
                    ACROSS devices: log2(D) radix-2 butterfly stages,
                    one `ppermute` pair-exchange per stage over ICI
  step 2:           *= w^(i2*k1)                       (local twiddle)
  step 3:           DFT_N2 over i2 (root w^D)          (local NTT)

The inverse mirrors the three steps with inverse roots and folds in
N^{-1}.  Output device order is bit-reversed in k1 and the local order
bit-reversed in k2 — irrelevant for convolution, where the pointwise
product happens in the same permuted order on both operands.

This is the correctness prototype for the multi-chip path: exact u64
modular arithmetic (p < 2^30 so products fit u64), proven bit-exact
against the single-device `polynomial.ntt_mul_small` on the CPU mesh
(tests/test_mesh.py).  A production version would run the local steps in
the u32-limb Pallas kernels and batch the leading axis.

No reference counterpart: the reference caps N at 8192 on one core
(`misc.c:147-158`); this is the framework's own scale-out extension.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import ntt as _ntt

_U64 = jnp.uint64


def _pow_table(base: int, count: int, p: int, step: int = 1) -> np.ndarray:
    """[base^(step*j) mod p for j in range(count)] via a running product."""
    out = np.empty(count, dtype=np.uint64)
    b = pow(base, step, p)
    v = 1
    for j in range(count):
        out[j] = v
        v = (v * b) % p
    return out


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


class DistNTTPlan:
    """Tables for the D-way coefficient-sharded negacyclic NTT."""

    def __init__(self, N: int, D: int, primes):
        assert N % D == 0 and D & (D - 1) == 0 and N & (N - 1) == 0
        self.N, self.D, self.N2 = N, D, N // D
        self.logD = D.bit_length() - 1
        self.primes = tuple(primes)
        Pn, N2, logD = len(self.primes), self.N2, self.logD
        with jax.ensure_compile_time_eval():
            twist = np.empty((Pn, N), np.uint64)
            itwist = np.empty((Pn, N), np.uint64)
            mid = np.empty((Pn, D, N2), np.uint64)
            imid = np.empty((Pn, D, N2), np.uint64)
            dev_tw = np.ones((logD, Pn, D), np.uint64)
            dev_itw = np.ones((logD, Pn, D), np.uint64)
            loc_tw = []   # per stage s: [Pn, h]
            loc_itw = []
            for m, p in enumerate(self.primes):
                assert (p - 1) % (2 * N) == 0
                g = _ntt._primitive_root(p)
                psi = pow(g, (p - 1) // (2 * N), p)
                ipsi = pow(psi, p - 2, p)
                w = (psi * psi) % p
                iw = pow(w, p - 2, p)
                ninv = pow(N, p - 2, p)
                twist[m] = _pow_table(psi, N, p)
                itwist[m] = (_pow_table(ipsi, N, p)
                             * np.uint64(ninv)) % np.uint64(p)
                # step-2 twiddle: w^(i2*k1) with k1 = bitrev(device, logD)
                for j in range(D):
                    k1 = _bitrev(j, logD)
                    mid[m, j] = _pow_table(w, N2, p, step=k1)
                    imid[m, j] = _pow_table(iw, N2, p, step=k1)
                # device-axis DIF/DIT stage twiddles (root wd = w^N2,
                # order D); bottom device j of stage h uses
                # W_{2h}^{j & (h-1)} with W_{2h} = wd^(D/(2h))
                wd = pow(w, N2, p)
                iwd = pow(wd, p - 2, p)
                for s in range(logD):
                    h = D >> (s + 1)
                    for j in range(D):
                        if j & h:
                            e = (j & (h - 1)) * (D // (2 * h))
                            dev_tw[s, m, j] = pow(wd, e, p)
                    hi = 1 << s          # DIT stage s has half-size 2^s
                    for j in range(D):
                        if j & hi:
                            e = (j & (hi - 1)) * (D // (2 * hi))
                            dev_itw[s, m, j] = pow(iwd, e, p)
            # local cyclic DFT_N2 stage twiddles (root wl = w^D)
            for s in range(N2.bit_length() - 1):
                h = N2 >> (s + 1)
                rows = np.empty((Pn, h), np.uint64)
                irows_h = 1 << s
                irows = np.empty((Pn, irows_h), np.uint64)
                for m, p in enumerate(self.primes):
                    w = pow(pow(_ntt._primitive_root(p),
                                (p - 1) // (2 * N), p), 2, p)
                    wl = pow(w, D, p)
                    iwl = pow(wl, p - 2, p)
                    rows[m] = _pow_table(wl, h, p, step=N2 // (2 * h))
                    irows[m] = _pow_table(iwl, irows_h, p,
                                          step=N2 // (2 * irows_h))
                loc_tw.append(jnp.asarray(rows))
                loc_itw.append(jnp.asarray(irows))
            self.twist = jnp.asarray(twist.reshape(Pn, D, N2))
            self.itwist = jnp.asarray(itwist.reshape(Pn, D, N2))
            self.mid = jnp.asarray(mid)
            self.imid = jnp.asarray(imid)
            self.dev_tw = jnp.asarray(dev_tw)
            self.dev_itw = jnp.asarray(dev_itw)
            self.loc_tw = loc_tw
            self.loc_itw = loc_itw
            self.p = jnp.asarray(np.array(self.primes, np.uint64))


def _col(t, ndim):
    """[P] -> [P, 1, ..., 1] (leading-P layout, `ndim` total dims)."""
    return t.reshape(t.shape[:1] + (1,) * (ndim - 1))


def _row(t, ndim):
    """[P, W] -> [P, 1, ..., 1, W]."""
    return t.reshape(t.shape[:1] + (1,) * (ndim - 2) + t.shape[-1:])


def _local_dft(x, plan: DistNTTPlan):
    """Iterative cyclic DIF over the last axis (length N2), output
    bit-reversed.  x: [P, ..., N2] u64 residues (< p); any number of
    batch dims between P and N2."""
    N2 = plan.N2
    for s, tw in enumerate(plan.loc_tw):
        h = N2 >> (s + 1)
        v = x.reshape(x.shape[:-1] + (N2 // (2 * h), 2, h))
        u, w_ = v[..., 0, :], v[..., 1, :]
        pb = _col(plan.p, u.ndim)
        top = (u + w_) % pb
        bot = ((u + pb - w_) * _row(tw, u.ndim)) % pb
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape)
    return x


def _local_idft(x, plan: DistNTTPlan):
    """Inverse of `_local_dft` (consumes bit-reversed), without the 1/N2
    scaling (folded into the plan's itwist)."""
    N2 = plan.N2
    for s, itw in enumerate(plan.loc_itw):
        h = 1 << s
        v = x.reshape(x.shape[:-1] + (N2 // (2 * h), 2, h))
        u, w_ = v[..., 0, :], v[..., 1, :]
        pb = _col(plan.p, u.ndim)
        wt = (w_ * _row(itw, u.ndim)) % pb
        top = (u + wt) % pb
        bot = (u + pb - wt) % pb
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape)
    return x


def _forward_sharded(x, plan: DistNTTPlan, axis: str, twist, mid):
    """x: this shard's [P, ..., N2] residues; twist/mid: local [P, N2]
    rows.  One ppermute per device stage."""
    D, logD = plan.D, plan.logD
    j = jax.lax.axis_index(axis)
    pcol = _col(plan.p, x.ndim)
    x = (x * _row(twist, x.ndim)) % pcol
    for s in range(logD):
        h = D >> (s + 1)
        recv = jax.lax.ppermute(
            x, axis, perm=[(i, i ^ h) for i in range(D)])
        is_bot = (j & h) != 0
        tw = _col(plan.dev_tw[s][:, j], x.ndim)            # [P, 1, ...]
        top = (x + recv) % pcol
        bot = ((recv + pcol - x) * tw) % pcol
        x = jnp.where(is_bot, bot, top)
    x = (x * _row(mid, x.ndim)) % pcol
    return _local_dft(x, plan)


def _inverse_sharded(x, plan: DistNTTPlan, axis: str, itwist, imid):
    D, logD = plan.D, plan.logD
    j = jax.lax.axis_index(axis)
    pcol = _col(plan.p, x.ndim)
    x = _local_idft(x, plan)
    x = (x * _row(imid, x.ndim)) % pcol
    for s in range(logD):
        h = 1 << s
        is_bot = (j & h) != 0
        itw = _col(plan.dev_itw[s][:, j], x.ndim)
        pre = jnp.where(is_bot, (x * itw) % pcol, x)
        recv = jax.lax.ppermute(
            pre, axis, perm=[(i, i ^ h) for i in range(D)])
        top = (pre + recv) % pcol
        bot = (recv + pcol - pre) % pcol
        x = jnp.where(is_bot, bot, top)
    return (x * _row(itwist, x.ndim)) % pcol


def make_dist_ntt_mul_small(mesh: Mesh, N: int, axis: str = "x",
                            max_abs_digit: int = 256):
    """Returns a jitted fn(d_small [N] i32/i64, b [N] u64) -> exact
    negacyclic product mod 2^64, computed with the coefficient axis
    sharded over `axis` of `mesh` (per-butterfly-stage ppermute
    collectives).  Bit-exact vs `polynomial.ntt_mul_small`."""
    D = mesh.shape[axis]
    bound = _ntt.conv_bound(N, max_abs_digit, 1)
    primes = _ntt.primes_for_bound(bound, N)
    dplan = DistNTTPlan(N, D, primes)
    splan = _ntt.get_plan(N, primes)       # for to_resi / garner only
    Pn, N2 = len(primes), dplan.N2

    def inner(d_res, b_res, twist, itwist, mid, imid):
        # blocks arrive as [P, 1, N2]
        sq = lambda t: t.reshape(Pn, N2)
        a_hat = _forward_sharded(sq(d_res), dplan, axis, sq(twist), sq(mid))
        b_hat = _forward_sharded(sq(b_res), dplan, axis, sq(twist), sq(mid))
        c = (a_hat * b_hat) % dplan.p[:, None]
        out = _inverse_sharded(c, dplan, axis, sq(itwist), sq(imid))
        return out.reshape(Pn, 1, N2)

    sharded = shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, axis, None),) * 6,
        out_specs=P(None, axis, None))

    @jax.jit
    def run(d, b):
        d_res = jnp.moveaxis(_ntt.to_resi_small(d, splan), -2, 0)  # [P, N]
        b_res = jnp.moveaxis(_ntt.to_resi_u64(b, splan), -2, 0)
        r = sharded(d_res.reshape(Pn, D, N2), b_res.reshape(Pn, D, N2),
                    dplan.twist, dplan.itwist, dplan.mid, dplan.imid)
        return _ntt.garner_u64(jnp.moveaxis(r.reshape(Pn, N), 0, -2),
                               splan)

    return run


# ---------------------------------------------------------------------------
# Serial emulation of the sharded transform (setup-time key / table prep)
# ---------------------------------------------------------------------------

def full_forward(x_res, plan: DistNTTPlan):
    """Single-device emulation of `_forward_sharded` over the full array:
    x_res [..., P, N] u64 residues -> [..., P, N] spectra in the dist
    ordering (device-major [D, N2], k1 bit-reversed across devices, local
    order bit-reversed).  Used to pre-transform bootstrap keys and
    monomial tables into the exact ordering the sharded path produces."""
    lead = x_res.shape[:-2]
    Pn, D, N2 = len(plan.primes), plan.D, plan.N2
    x = x_res.reshape(lead + (Pn, D, N2))
    p4 = plan.p.reshape(Pn, 1, 1)
    x = (x * plan.twist) % p4
    for s in range(plan.logD):
        h = D >> (s + 1)
        v = x.reshape(lead + (Pn, D // (2 * h), 2, h, N2))
        u, w_ = v[..., 0, :, :], v[..., 1, :, :]
        p5 = plan.p.reshape(Pn, 1, 1, 1)
        tw = plan.dev_tw[s].reshape(Pn, D // (2 * h), 2, h)[
            :, :, 1, :][..., None]                       # [P, blk, h, 1]
        top = (u + w_) % p5
        bot = ((u + p5 - w_) * tw) % p5
        x = jnp.stack([top, bot], axis=-3).reshape(lead + (Pn, D, N2))
    x = (x * plan.mid) % p4
    # local DFT: move P to the front for the shared helper
    xp = jnp.moveaxis(x, -3, 0)                          # [P, ..., D, N2]
    xp = _local_dft(xp, plan)
    x = jnp.moveaxis(xp, 0, -3)
    return x.reshape(lead + (Pn, D * N2))


def dist_xpow2_tables(plan: DistNTTPlan):
    """Spectra of X^(2^t), t = 0..logN, in the dist ordering:
    [logN+1, P, N] u64.  Bit log2(2N) of an exponent is the identity
    (X^2N = 1) and needs no row — same contract as `ntt.NTTPlan.xpow2`."""
    N, Pn = plan.N, len(plan.primes)
    T = N.bit_length()                                   # logN + 1 rows
    mono = np.zeros((T, Pn, N), np.uint64)
    for t in range(T - 1):
        mono[t, :, 1 << t] = 1
    for m, p in enumerate(plan.primes):
        mono[T - 1, m, 0] = p - 1                        # X^N = -1
    with jax.ensure_compile_time_eval():
        return full_forward(jnp.asarray(mono), plan)


def _dist_xpow(a_int, tables, p):
    """Monomial spectra zeta^a in dist ordering: a_int [...] int32 in
    [0, 2N]; tables [T, P, N2loc]; p [P] -> [..., P, N2loc] u64."""
    T = tables.shape[0]
    x = jnp.ones(a_int.shape + tables.shape[1:], _U64)
    pb = p[:, None]
    for t in range(T):
        bit = ((a_int >> t) & 1)[..., None, None] == 1
        x = jnp.where(bit, (x * tables[t]) % pb, x)
    return x


# ---------------------------------------------------------------------------
# N-sharded blind rotate (the "giant-N" end-to-end path)
# ---------------------------------------------------------------------------

def make_dist_blind_rotate(mesh: Mesh, N: int, k: int, l: int,
                           Bg_bit: int, axis: str = "x"):
    """Coefficient-sharded blind rotate: every polynomial of the
    accumulator, the digit spectra, and the bootstrap key lives SPLIT
    over `axis` of the mesh (N/D coefficients per device); the n CMUX
    steps run the rotation-free algorithm (`bootstrap._cmux_step_rotntt`)
    so the per-step data-dependent rotation is a local diagonal twiddle
    multiply — cross-device traffic is exactly one ppermute per butterfly
    stage of each forward/inverse dist-NTT.

    Returns (prep_key, run):
      prep_key(bk)      -> key spectra [n, J, C, P, N] in dist ordering
                           (shard the last axis over `axis`)
      run(acc0, a_int, key_dist) -> rotated accumulator [..., C, N] u64,
                           bit-identical to the single-chip rot-NTT scan
                           with the same primes.

    SURVEY §5 "long-context analog": beyond the reference's N <= 8192
    envelope (`misc.c:147-158`), one chip's transform would not fit; this
    path scales N over ICI instead."""
    from jax.sharding import NamedSharding
    from ..torus import gadget_decompose

    D = mesh.shape[axis]
    J = (k + 1) * l
    bound = _ntt.external_product_bound(N, Bg_bit, l, k)  # rot-NTT 2x
    primes = _ntt.primes_for_bound(bound, N)
    dplan = DistNTTPlan(N, D, primes)
    splan = _ntt.get_plan(N, primes)
    Pn = len(primes)
    xp2 = dist_xpow2_tables(dplan)                        # [T, P, N]
    tw_f = dplan.twist.reshape(Pn, N)
    tw_i = dplan.itwist.reshape(Pn, N)
    mid_f = dplan.mid.reshape(Pn, N)
    mid_i = dplan.imid.reshape(Pn, N)

    def prep_key(bk):
        """Bootstrap key -> dist-ordered spectra [n, J, C, P, N] u64.
        Recovers the raw TRGSW rows from the key's own NTT form (exact:
        the rows are u64 values < prod(p)/2), then re-transforms with the
        dist plan."""
        rows = _ntt.from_ntt_u64(bk.v, bk.plan())         # [n, J, C, N]
        res = _ntt.to_resi_u64(rows, splan)               # [n, J, C, P, N]
        return full_forward(res, dplan)

    def inner(acc, a_all, kv_all, xp, twf, twi, midf, midi):
        # acc [B, C, N2]; a_all [n, B] i32; kv_all [n, J, C, P, N2]
        B = acc.shape[0]
        p_ = splan.p

        def step(acc, xs):
            a_i, kv = xs
            dig = gadget_decompose(acc, Bg_bit, l)        # [B, C, l, N2]
            dig = dig.reshape(B, J, -1)
            dres = _ntt.to_resi_small(dig, splan)         # [B, J, P, N2]
            x = jnp.moveaxis(dres, -2, 0)                 # [P, B, J, N2]
            spec = _forward_sharded(x, dplan, axis, twf, midf)
            kvm = jnp.moveaxis(kv, -2, 0)                 # [P, J, C, N2]
            prod = jnp.sum(
                spec[:, :, :, None, :] * kvm[:, None], axis=2,
                dtype=_U64) % _col(p_, 4)                 # [P, B, C, N2]
            t = _dist_xpow(a_i, xp, p_)                   # [B, P, N2]
            tm1 = jnp.moveaxis(t, -2, 0) - _U64(1)        # zeta^a != 0
            prod = (prod * tm1[:, :, None, :]) % _col(p_, 4)
            inv = _inverse_sharded(
                prod.reshape(Pn, B * (k + 1), -1), dplan, axis, twi, midi)
            res = jnp.moveaxis(
                inv.reshape(Pn, B, k + 1, -1), 0, -2)     # [B, C, P, N2]
            return acc + _ntt.garner_u64(res, splan), None

        acc, _ = jax.lax.scan(step, acc, (a_all, kv_all))
        return acc

    sharded = shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None),
                  P(None, None, None, None, axis), P(None, None, axis),
                  P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=P(None, None, axis))

    @jax.jit
    def run(acc0, a_int, key_dist):
        return sharded(acc0, jnp.moveaxis(a_int, -1, 0).astype(jnp.int32),
                       key_dist, xp2, tw_f, tw_i, mid_f, mid_i)

    return prep_key, run


def functional_bootstrap_n_sharded(mesh: Mesh, tv, c, bk, key_dist, run,
                                   torus_base: int):
    """Full PBS with the blind rotate N-sharded: test-vector rotation by
    -round(b) happens replicated (cheap, coefficient domain), the CMUX
    scan runs sharded, extraction on the gathered result."""
    import math as _math
    from .. import trlwe as _trlwe
    from ..torus import TORUS_DTYPE, torus2int
    from ..bootstrap import _prec_offset

    N = bk.N
    log_N2 = int(_math.log2(2 * N))
    b_int = torus2int(c.b + _prec_offset(torus_base),
                      log_N2).astype(jnp.int32)
    acc = _trlwe.mul_by_xai(tv, 2 * N - b_int)
    a_int = torus2int(jnp.asarray(c.a, TORUS_DTYPE),
                      log_N2).astype(jnp.int32)
    st = acc.stacked()
    batch = a_int.shape[:-1]
    B = 1
    for d in batch:
        B *= d
    st = jnp.broadcast_to(st, batch + st.shape[-2:]).reshape(
        B, bk.k + 1, N)
    out = run(st, a_int.reshape(B, -1), key_dist)
    from ..trlwe import from_stacked
    return _trlwe.extract_tlwe(
        from_stacked(out.reshape(batch + (bk.k + 1, N))), 0)
