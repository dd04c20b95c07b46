"""Fused Pallas TPU kernel for the blind-rotate CMUX step (external product).

This is the hot kernel of the whole framework: one step of
`blind_rotate` (`/root/reference/src/bootstrap.c:107-122`) is

    acc += BK_i (x) ((X^{a_i} - 1) * acc)

whose inner external product (`trgsw_mul_trlwe_DFT`,
`/root/reference/src/trgsw.c:385-423`) is, in this framework's exact
CRT-NTT formulation (see `mosfhet_tpu/ntt.py`):

    digits   = gadget-decompose(rot)            [(k+1)l, N]   signed
    spectrum = forward NTT(digits mod p_m)      per prime m
    acc_spec = sum_j spectrum_j * KEY_j         lazy Shoup products
    delta    = CRT(inverse NTT(acc_spec))       exact mod 2^64

The pure-jnp path does all of this in emulated uint64 (XLA lowers u64
multiplies to long chains of 32-bit ops); this kernel does it in *native*
uint32 on the VPU, which is the whole speedup:

- every NTT prime p is in (2^28, 2^30) (`ntt.MASTER_PRIMES`), so lazy
  values (< 2p) and butterfly sums (< 4p) fit uint32;
- Shoup modular multiplication needs one mulhi32, built from four 16x16
  partial products (exact in native 32-bit multiplies);
- the 64-bit CRT readback (Garner) is done in explicit 32-bit limbs.

Data layout: **sublanes = batch tile (BT rows), lanes = N coefficients**.
Butterfly partners are lane-rolls (`pltpu.roll` along axis 1); twiddle
factors vary along lanes only, so each stage's twiddles are one [1, N] row
broadcast over sublanes — no transposes, reshapes, or gathers anywhere, and
the same code handles every stage of every size.  The cost is one Shoup
multiply per *element* per stage instead of per butterfly pair (2x the
minimal multiplication count) — a good trade for zero data movement.

The kernel computes the full CMUX delta for a [BT]-batch tile per grid
program; the scan over the n LWE mask digits and the per-sample negacyclic
rotation X^{a_i} stay in XLA (see `bootstrap.blind_rotate`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ntt as _ntt
from ..torus import gadget_offset

_U32 = jnp.uint32
# Batch tile (sublane rows per kernel invocation).  Round-4 sweep under
# the default MXU plan (results_r4.jsonl, L2 batch 256): BT=64 441
# boot/s vs BT=32 422 vs BT=128 437; neutral at batch 512 (459.9 vs
# 459.6).  64 is the default; the lane-roll plan's sweet spot was 32 —
# override with MOSFHET_BT for experiments.
import os as _os
DEFAULT_BT = int(_os.environ.get("MOSFHET_BT", "64"))


def kernel_eligible(N: int, primes) -> bool:
    """Single source of truth for when the fused kernels can run: a real
    TPU device, power-of-two N >= 128 (one lane tile), and every NTT prime
    inside the u32-lazy window (2^28, 2^30).  `MOSFHET_TPU_FORCE_JNP`
    disables globally.  (The dynamic-key paths additionally need
    p > 2^30/1.75 for `_barrett_lazy` — asserted where the plan's Barrett
    constants are built, `ntt.NTTPlan`.)"""
    import os
    if os.environ.get("MOSFHET_TPU_FORCE_JNP"):
        return False
    shape_ok = (N >= 128 and N & (N - 1) == 0
                and all((1 << 28) < p < (1 << 30) for p in primes))
    if os.environ.get("MOSFHET_TPU_FORCE_KERNEL"):
        # trace-only escape hatch (roofline op counting on CPU): the
        # pallas path TRACES fine anywhere; it just cannot execute
        return shape_ok
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon") and shape_ok


# ---------------------------------------------------------------------------
# u32 modular primitives (kernel-internal)
# ---------------------------------------------------------------------------

def _mulhi32(a, b):
    """High 32 bits of a * b for uint32 arrays, via 16-bit partial products
    (each partial fits uint32 exactly)."""
    mask = _U32(0xFFFF)
    a0 = a & mask
    a1 = a >> _U32(16)
    b0 = b & mask
    b1 = b >> _U32(16)
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    mid = m01 + (m00 >> _U32(16))          # <= 2^32 - 2^17 + 2^16: no overflow
    mid2 = mid + m10                        # may wrap
    carry = (mid2 < mid).astype(_U32)
    return m11 + (mid2 >> _U32(16)) + (carry << _U32(16))


def _shoup_lazy(a, w, ws, p: int):
    """a * w mod p in [0, 2p), Harvey-style: valid for any a < 2^32, w < p,
    ws = floor(w * 2^32 / p).  3 low multiplies + 1 mulhi."""
    q = _mulhi32(a, ws)
    return a * w - q * _U32(p)


def _cond_sub(x, c: int):
    cc = _U32(c)
    return jnp.where(x >= cc, x - cc, x)


def _exact(x, p: int):
    """[0, 2p) -> [0, p)."""
    return _cond_sub(x, p)


def _barrett_lazy(a, b, p: int, mup: int):
    """a * b mod p in [0, 2p) for two *dynamic* u32 operands (no precomputed
    Shoup companion) — the kernel counterpart of `ntt.barrett_mul`.

    Requires a < 2p (lazy ok), b < p, and p in (2^29.2, 2^30) (asserted when
    the plan is built).  mup = floor(2^62/p) - 2^32 (mu62 has 33 bits for
    these primes, so it is carried as 2^32 + mup).

    z = a*b < 2p^2 < 2^61; t = floor(z/2^30) < 2^31;
    q = t + mulhi(t, mup) = floor(t * mu62 / 2^32) >= floor(z/p) - 2,
    so r = z - q*p < 3p < 2^32 and one conditional subtraction gives [0, 2p).
    One extra mulhi vs `_shoup_lazy`.
    """
    zlo = a * b
    zhi = _mulhi32(a, b)
    t = (zhi << _U32(2)) | (zlo >> _U32(30))
    q = t + _mulhi32(t, _U32(mup))
    r = zlo - q * _U32(p)          # exact: true r in [0, 3p) fits u32
    return _cond_sub(r, 2 * p)


# ---------------------------------------------------------------------------
# NTT stages (lane-roll butterflies)
# ---------------------------------------------------------------------------

def _fwd_ntt(x, ftw, ftws, liota, p: int, N: int, lazy3: bool = False):
    """Forward negacyclic NTT over the lane axis.

    x: [BT, N] u32 in [0, 2p) (lazy ok).  ftw/ftws: [S, N] twiddle rows
    (stage-major; see `PBSKernelPlan`).  Output lazy in [0, 2p) — or
    [0, 8p) with `lazy3` — bit-reversed order (matches
    `ntt.forward_ntt` mod p; representatives differ under lazy3, which is
    sound everywhere the output only feeds `_shoup_lazy`/mod-p sinks).

    Stages with half-block t >= 128 slice U/V halves at lane-tile
    boundaries (half the Shoup multiplies, no rolls or selects); smaller
    stages use full-width lane-roll butterflies.

    lazy3 (requires 8p <= 2^32, the `NARROW_PRIMES` window): each stage
    adds < 2p, so three stages fit before reduction — reduce every third
    stage with two conditional subtractions (4p then 2p) instead of one
    per stage: 11 cond-subs -> 6 for N=2048.
    """
    S = N.bit_length() - 1
    bound = 1                       # x < bound * 2p
    for s in range(S):
        t = N >> (s + 1)
        out_b = bound + 1
        reduce_now = (out_b >= 4) if lazy3 else True
        if t >= 128:
            m = 1 << s
            parts = []
            for b in range(m):
                base = b * 2 * t
                u = x[:, base:base + t]
                v = x[:, base + t:base + 2 * t]
                tw = jnp.broadcast_to(ftw[s:s + 1, base:base + t], u.shape)
                tws = jnp.broadcast_to(ftws[s:s + 1, base:base + t], u.shape)
                vw = _shoup_lazy(v, tw, tws, p)
                hi = u + vw
                lo = u + _U32(2 * p) - vw
                if reduce_now:
                    if out_b > 2:
                        hi = _cond_sub(hi, 4 * p)
                        lo = _cond_sub(lo, 4 * p)
                    hi = _cond_sub(hi, 2 * p)
                    lo = _cond_sub(lo, 2 * p)
                parts.append(hi)
                parts.append(lo)
            x = jnp.concatenate(parts, axis=1)
        else:
            tw = jnp.broadcast_to(ftw[s:s + 1, :], x.shape)
            tws = jnp.broadcast_to(ftws[s:s + 1, :], x.shape)
            mask_u = (liota & _U32(2 * t - 1)) < _U32(t)
            fwd = pltpu.roll(x, jnp.int32(N - t), 1)  # at U rows: V (i+t)
            bwd = pltpu.roll(x, jnp.int32(t), 1)      # at V rows: U (i-t)
            v = jnp.where(mask_u, fwd, x)
            u = jnp.where(mask_u, x, bwd)
            vw = _shoup_lazy(v, tw, tws, p)     # < 2p
            # branchless: U lanes add vw, V lanes add 2p - vw
            term = jnp.where(mask_u, vw, _U32(2 * p) - vw)
            x = u + term
            if reduce_now:
                if out_b > 2:
                    x = _cond_sub(x, 4 * p)
                x = _cond_sub(x, 2 * p)
        bound = 1 if reduce_now else out_b
    return x


def _fwd_ntt_mxu(x, ftw, ftws, tw, tws, w, p: int, s256: int, red1: int,
                 N: int, lazy_out: bool = False):
    """Forward negacyclic NTT with the sub-128 stage tail on the MXU.

    Mathematically identical (mod p) to `_fwd_ntt`: stages whose butterfly
    span is >= 128 lanes run as the same tile-sliced Shoup butterflies; the
    remaining log2(128) = 7 stages act block-diagonally on each 128-lane
    block, and every block's 128x128 stage-product matrix is the block-0
    matrix times a per-block column twist (classic Cooley-Tukey twiddle
    factorization, verified exactly at plan build).  So the whole tail is

        y_b = M0 @ (T_b * x_b)   mod p        (per 128-lane block b)

    evaluated exactly on the int8 MXU: fold the four input byte-limb
    shifts 2^{8j} into matrix copies Mj = M0 * 2^{8j} mod p, balanced-
    digit decompose Mj over i and the twisted input over j (digits in
    [-128,128)), contract [R, 4*128] @ [4*128, 4*128] in int8->int32
    (partials < 128*128*512 = 2^23 < int32), then recombine the four
    int32 planes P_i with a 3-step Shoup-Horner in base 2^8 plus one
    final Shoup-by-1 reduction to the lazy [0, 2p) contract.

    x: [R, N] u32 (any values; lazy ok).  tw/tws: [1, N] twist row
    (kept 2-D end to end: newaxis indexing inside a kernel lowers to a
    1-D gather, which Mosaic rejects — only 2-D gathers are supported).
    w: [4*128, 4*128] int8 limb matrix (see `PBSKernelPlan._build_mxu`).
    s256/red1: Shoup companions of 256 and 1 for p.  Output matches
    `ntt.forward_ntt` mod p, bit-reversed order, in [0, 2p).
    """
    S = N.bit_length() - 1
    R = x.shape[0]
    BLK = 128
    NB = N // BLK
    for s in range(S - 7):                    # head stages, span >= 128
        t = N >> (s + 1)
        m = 1 << s
        parts = []
        for b in range(m):
            base = b * 2 * t
            u = x[:, base:base + t]
            v = x[:, base + t:base + 2 * t]
            twb = jnp.broadcast_to(ftw[s:s + 1, base:base + t], u.shape)
            twsb = jnp.broadcast_to(ftws[s:s + 1, base:base + t], u.shape)
            vw = _shoup_lazy(v, twb, twsb, p)
            parts.append(_cond_sub(u + vw, 2 * p))
            parts.append(_cond_sub(u + _U32(2 * p) - vw, 2 * p))
        x = jnp.concatenate(parts, axis=1)
    # per-block column twist; the lazy result (< 2p) feeds the byte-limb
    # split directly — 2p + 0x80808080 < 2^32 for every kernel prime
    # (asserted at plan build), so no exact reduction is needed
    twr = jnp.broadcast_to(tw, (R, N))
    twsr = jnp.broadcast_to(tws, (R, N))
    xt = _shoup_lazy(x, twr, twsr, p)                     # < 2p
    outs = []
    for b in range(NB):
        xb = xt[:, b * BLK:(b + 1) * BLK] + _U32(0x80808080)
        X = jnp.concatenate(
            [(((xb >> _U32(8 * j)) & _U32(255)).astype(jnp.int32)
              - jnp.int32(128)).astype(jnp.int8) for j in range(4)],
            axis=1)                                       # [R, 512] i8
        pm = jax.lax.dot_general(
            X, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [R, 512] i32
        # P_i planes are signed (> -2^23); shift by +p into u32 range
        q = [(pm[:, i * BLK:(i + 1) * BLK] + jnp.int32(p)).astype(_U32)
             for i in range(4)]
        t_ = q[3]
        for i in (2, 1, 0):
            t_ = _shoup_lazy(t_, _U32(256), _U32(s256), p) + q[i]
        # lazy_out skips the final reduce-by-1: t_ < 3p + 2^23 < 2^32,
        # fine wherever the next op is a Shoup multiply (any-u32
        # multiplicand).  Barrett consumers need the reduced < 2p form.
        outs.append(t_ if lazy_out
                    else _shoup_lazy(t_, _U32(1), _U32(red1), p))
    return jnp.concatenate(outs, axis=1)


def _inv_ntt(x, itw, itws, liota, p: int, N: int):
    """Inverse NTT (consumes bit-reversed), including 1/N scaling.

    x: [BT, N] u32 in [0, 2p).  itw/itws: [S+1, N]; row S is the n_inv
    scaling row.  Output exact in [0, p).
    """
    S = N.bit_length() - 1
    for s in range(S):
        t = 1 << s
        if t >= 128:
            m = N >> (s + 1)
            parts = []
            for b in range(m):
                base = b * 2 * t
                u = x[:, base:base + t]
                v = x[:, base + t:base + 2 * t]
                tw = jnp.broadcast_to(itw[s:s + 1, base:base + t], u.shape)
                tws = jnp.broadcast_to(itws[s:s + 1, base:base + t], u.shape)
                parts.append(_cond_sub(u + v, 2 * p))
                parts.append(_shoup_lazy(u + _U32(2 * p) - v, tw, tws, p))
            x = jnp.concatenate(parts, axis=1)
            continue
        tw = jnp.broadcast_to(itw[s:s + 1, :], x.shape)
        tws = jnp.broadcast_to(itws[s:s + 1, :], x.shape)
        mask_u = (liota & _U32(2 * t - 1)) < _U32(t)
        fwd = pltpu.roll(x, jnp.int32(N - t), 1)  # fetch lane i+t
        bwd = pltpu.roll(x, jnp.int32(t), 1)      # fetch lane i-t
        partner = jnp.where(mask_u, fwd, bwd)
        add = _cond_sub(x + partner, 2 * p)              # U + V
        diff = jnp.where(mask_u, x + _U32(2 * p) - partner,
                         partner + _U32(2 * p) - x)      # U - V + 2p < 2^32
        w = _shoup_lazy(diff, tw, tws, p)                # < 2p
        x = jnp.where(mask_u, add, w)
    ninv = jnp.broadcast_to(itw[S:S + 1, :], x.shape)
    ninvs = jnp.broadcast_to(itws[S:S + 1, :], x.shape)
    return _exact(_shoup_lazy(x, ninv, ninvs, p), p)


def _inv_ntt_mxu(x, itw, itws, ttw, ttws, w, p: int, s256: int, N: int):
    """Inverse NTT with the sub-128 stage head on the MXU.

    Dual of `_fwd_ntt_mxu`: the inverse's FIRST log2(128) = 7 stages
    (spans < 128) act block-diagonally on 128-lane blocks, and every
    block's 128x128 stage-product matrix is a ROW twist of the block-0
    matrix (transpose of the forward's column-twist factorization,
    verified exactly at plan build):

        y_b = T_b * (Mi0 @ x_b)   mod p       (per 128-lane block b)

    evaluated with the same int8 byte-limb contraction as the forward.
    The row twist is free: the recombination's final reduce-by-Shoup
    multiplies by T_b[o] instead of by 1.  Head stages (spans >= 128)
    and the 1/N scaling then run exactly as `_inv_ntt`; since that path
    ends canonical, the output is bit-identical to `_inv_ntt`.

    x: [R, N] u32 in [0, 2p).  ttw/ttws: [1, N] row-twist (lane b*128+o
    holds T_b[o]; 2-D for the same Mosaic gather rule as `_fwd_ntt_mxu`).
    w: [512, 512] int8 limb matrix of Mi0.  Output exact in [0, p).
    """
    S = N.bit_length() - 1
    R = x.shape[0]
    BLK = 128
    NB = N // BLK
    # input contract is [0, 2p) and 2p + 0x80808080 < 2^32 for every
    # kernel prime (asserted at plan build) — no exact reduction needed
    xe = x
    outs = []
    for b in range(NB):
        xb = xe[:, b * BLK:(b + 1) * BLK] + _U32(0x80808080)
        X = jnp.concatenate(
            [(((xb >> _U32(8 * j)) & _U32(255)).astype(jnp.int32)
              - jnp.int32(128)).astype(jnp.int8) for j in range(4)],
            axis=1)                                       # [R, 512] i8
        pm = jax.lax.dot_general(
            X, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [R, 512] i32
        q = [(pm[:, i * BLK:(i + 1) * BLK] + jnp.int32(p)).astype(_U32)
             for i in range(4)]
        t_ = q[3]
        for i in (2, 1, 0):
            t_ = _shoup_lazy(t_, _U32(256), _U32(s256), p) + q[i]
        outs.append(t_)
    # One full-width Shoup applies the per-block row twist AND the final
    # reduction (Shoup-lazy takes any u32 multiplicand).  Per-block
    # twist slices ttw[:, b*128:(b+1)*128] would carry a lane offset of
    # 128 into the (1,128)->(R,128) broadcast, which the Mosaic layout
    # pass rejects ("Invalid input layout"); the full-width row is
    # offset-0 and broadcasts fine.
    x = _shoup_lazy(jnp.concatenate(outs, axis=1),
                    jnp.broadcast_to(ttw, (R, N)),
                    jnp.broadcast_to(ttws, (R, N)), p)
    # head stages, spans >= 128: tile-sliced butterflies as in _inv_ntt
    for s in range(7, S):
        t = 1 << s
        m = N >> (s + 1)
        parts = []
        for b in range(m):
            base = b * 2 * t
            u = x[:, base:base + t]
            v = x[:, base + t:base + 2 * t]
            tw = jnp.broadcast_to(itw[s:s + 1, base:base + t], u.shape)
            tws = jnp.broadcast_to(itws[s:s + 1, base:base + t], u.shape)
            parts.append(_cond_sub(u + v, 2 * p))
            parts.append(_shoup_lazy(u + _U32(2 * p) - v, tw, tws, p))
        x = jnp.concatenate(parts, axis=1)
    ninv = jnp.broadcast_to(itw[S:S + 1, :], x.shape)
    ninvs = jnp.broadcast_to(itws[S:S + 1, :], x.shape)
    return _exact(_shoup_lazy(x, ninv, ninvs, p), p)


# ---------------------------------------------------------------------------
# Kernel plan: precomputed tables + static config
# ---------------------------------------------------------------------------

class PBSKernelPlan:
    """Tables and constants for one (N, primes, l, Bg_bit, k) configuration."""

    def __init__(self, N: int, primes: tuple, l: int, Bg_bit: int, k: int,
                 bt: int = DEFAULT_BT, mxu: bool = False,
                 rot_ntt: bool = False):
        assert all((1 << 28) < p < (1 << 30) for p in primes), \
            "pallas kernel needs primes in (2^28, 2^30)"
        # Plans are cached and may first be requested inside a jit trace;
        # force concrete table creation (else the cached arrays would be
        # tracers and leak into later traces).
        with jax.ensure_compile_time_eval():
            self._build(N, primes, l, Bg_bit, k, bt)
            self.use_mxu = bool(mxu) and N >= 128
            if self.use_mxu:
                self._build_mxu(N)
            # rotation-free step (MOSFHET_ROT_NTT): monomial-spectrum
            # rows zeta^(2^j) as u32 (+ Shoup), from `ntt.NTTPlan.xpow2`.
            # Needs the dynamic-operand Barrett window for the final
            # (zeta^a - 1) ⊙ spec product.
            self.rot_ntt = bool(rot_ntt) and self.barrett_ok
            if self.rot_ntt:
                plan = _ntt.get_plan(N, self.primes)
                self.rot_tw = jnp.asarray(plan.xpow2, _U32)
                self.rot_tws = jnp.asarray(plan.xpow2_shoup, _U32)

    def _build(self, N, primes, l, Bg_bit, k, bt):
        from ..torus import TORUS_BITS
        self.N, self.primes, self.l, self.Bg_bit, self.k, self.bt = \
            N, tuple(primes), l, Bg_bit, k, bt
        self.tb = TORUS_BITS          # torus width fixed per process
        self.nl = TORUS_BITS // 32    # u32 limbs per torus word
        self.P = len(primes)
        self.C = k + 1
        self.J = (k + 1) * l
        plan = _ntt.get_plan(N, self.primes)
        S = N.bit_length() - 1
        logN = S

        psi = np.asarray(plan.psi_rev, dtype=np.uint64)      # [P, N]
        psis = np.asarray(plan.psi_rev_shoup, dtype=np.uint64)
        ipsi = np.asarray(plan.ipsi_rev, dtype=np.uint64)
        ipsis = np.asarray(plan.ipsi_rev_shoup, dtype=np.uint64)
        ninv = np.asarray(plan.n_inv, dtype=np.uint64)
        ninvs = np.asarray(plan.n_inv_shoup, dtype=np.uint64)

        n_idx = np.arange(N)
        ftw = np.zeros((self.P, S, N), np.uint32)
        ftws = np.zeros((self.P, S, N), np.uint32)
        itw = np.zeros((self.P, S + 1, N), np.uint32)
        itws = np.zeros((self.P, S + 1, N), np.uint32)
        for m in range(self.P):
            for s in range(S):
                blk = (1 << s) + (n_idx >> (logN - s))
                ftw[m, s] = psi[m][blk]
                ftws[m, s] = psis[m][blk]
                iblk = (N >> (s + 1)) + (n_idx >> (s + 1))
                itw[m, s] = ipsi[m][iblk]
                itws[m, s] = ipsis[m][iblk]
            itw[m, S] = ninv[m]
            itws[m, S] = ninvs[m]
        self.ftw = jnp.asarray(ftw)
        self.ftws = jnp.asarray(ftws)
        self.itw = jnp.asarray(itw)
        self.itws = jnp.asarray(itws)

        # Garner mixed-radix constants as python ints (baked into the kernel).
        self.garner_w = []       # [m][j] -> (prefix_j mod p_m, shoup)
        self.garner_cinv = []    # [m] -> (inv(prefix_m) mod p_m, shoup)
        for m in range(self.P):
            p = self.primes[m]
            row, prefix = [], 1
            for j in range(m):
                w = prefix % p
                row.append((w, (w << 32) // p))
                prefix *= self.primes[j]
            self.garner_w.append(row)
            if m > 0:
                c = pow(prefix % p, p - 2, p)
                self.garner_cinv.append((c, (c << 32) // p))
            else:
                self.garner_cinv.append(None)

        off = gadget_offset(Bg_bit, l, rounded=True)
        self.off_lo = off & 0xFFFFFFFF
        self.off_hi = off >> 32

        # Constants for the dynamic-operand (Barrett) paths and the
        # u64-limb -> centered-residue reduction used by the unfolded /
        # UBR kernels (`ntt.barrett_mul` / `ntt.to_resi_u64` analogs).
        self.mup = []     # [m] -> floor(2^62/p) - 2^32  (33-bit mu, low part)
        self.red1 = []    # [m] -> floor(2^32/p)         (Shoup companion of 1)
        self.c32 = []     # [m] -> (2^32 mod p, shoup companion)
        self.c64m = []    # [m] -> 2^64 mod p
        # Depth-3 lazy chains in the forward NTT need butterfly sums
        # < 8p to fit u32 (the `NARROW_PRIMES` ablation window).
        self.lazy3 = max(self.primes) <= (1 << 32) // 8
        self.barrett_ok = min(self.primes) > (1 << 30) // 1.75
        for p in self.primes:
            mu62 = (1 << 62) // p
            if self.barrett_ok:
                assert (1 << 32) <= mu62 < (1 << 33)
                self.mup.append(mu62 - (1 << 32))
            else:
                self.mup.append(None)   # dynamic-operand paths unusable
            self.red1.append((1 << 32) // p)
            c32 = (1 << 32) % p
            self.c32.append((c32, (c32 << 32) // p))
            self.c64m.append((1 << 64) % p)


    def _build_mxu(self, N):
        """Tables for `_fwd_ntt_mxu`: the per-block column twists and the
        shared int8 limb matrix of the sub-128 stage tail.

        The tail (7 stages, spans < 128) of `ntt.forward_ntt` is simulated
        on 128 basis vectors to extract the per-block 128x128 matrices
        M_b; the Cooley-Tukey factorization M_b = M_0 * diag(T_b) is then
        *verified exactly* (u64 numpy, all blocks/rows/primes) rather than
        assumed, and M_0 is expanded into the [4*128, 4*128] balanced
        byte-limb form contracted by the kernel's int8 matmul."""
        BLK = 128
        NB = N // BLK
        S = N.bit_length() - 1
        s_head = S - 7
        P = self.P
        # the MXU byte-limb split feeds LAZY (< 2p) values straight into
        # the +0x80808080 balanced-digit trick — requires headroom:
        assert 2 * max(self.primes) + 0x80808080 < (1 << 32), \
            "MXU NTT needs 2p + 0x80808080 < 2^32 (p < ~1.0695e9)"
        plan = _ntt.get_plan(N, self.primes)
        psi = np.asarray(plan.psi_rev, np.uint64)            # [P, N]
        pp = np.array(self.primes, np.uint64)[None, :, None, None]

        basis = np.zeros((BLK, P, N), np.uint64)
        for c in range(BLK):
            basis[c, :, c::BLK] = 1          # same offset in every block
        x = basis
        for s in range(s_head, S):
            t = N >> (s + 1)
            m = 1 << s
            xr = x.reshape(-1, P, m, 2, t)
            U, V = xr[:, :, :, 0, :], xr[:, :, :, 1, :]
            Sw = psi[:, m:2 * m][None, :, :, None]
            Vw = (V * Sw) % pp
            x = np.stack([(U + Vw) % pp, (U + pp - Vw) % pp],
                         axis=3).reshape(-1, P, N)
        # M[b, p, o, c] = response at output b*BLK+o to basis vector c
        M = x.reshape(BLK, P, NB, BLK).transpose(2, 1, 3, 0)

        twist = np.zeros((P, N), np.uint32)
        tws = np.zeros((P, N), np.uint32)
        W = np.zeros((P, 4 * BLK, 4 * BLK), np.int8)
        for p_i, p in enumerate(self.primes):
            inv0 = np.array([pow(int(v), p - 2, p) for v in M[0, p_i, 0]],
                            dtype=np.uint64)
            for b in range(NB):
                T = (M[b, p_i, 0] * inv0) % p                # [BLK]
                assert np.array_equal((M[0, p_i] * T[None, :]) % p,
                                      M[b, p_i]), \
                    "tail twist factorization violated"
                twist[p_i, b * BLK:(b + 1) * BLK] = T
                tws[p_i, b * BLK:(b + 1) * BLK] = (
                    (T.astype(object) << 32) // p).astype(np.uint64)
            M0 = M[0, p_i].astype(np.int64)                  # [o, c] < 2^30
            for j in range(4):
                Mj = (M0 << (8 * j)) % p
                Moff = Mj + 0x80808080
                for i in range(4):
                    D = ((Moff >> (8 * i)) & 255) - 128      # [-128, 128)
                    # LHS cols are (j*BLK + c); out cols are (i*BLK + o)
                    W[p_i, j * BLK:(j + 1) * BLK,
                      i * BLK:(i + 1) * BLK] = D.T.astype(np.int8)
        self.mxu_tw = jnp.asarray(twist)
        self.mxu_tws = jnp.asarray(tws)
        self.mxu_w = jnp.asarray(W)
        self.s256 = [((256 << 32) // p) for p in self.primes]

        # ---- inverse tail: the FIRST 7 stages (spans < 128) are likewise
        # block-diagonal; mirror `_inv_ntt`'s stage math on the same basis
        # and verify the transposed (ROW twist) factorization
        # Mi_b = diag(T_b) @ Mi_0 exactly.
        itw_np = np.asarray(self.itw, np.uint64)             # [P, S+1, N]
        x = basis
        for s in range(7):
            t = 1 << s
            g = N // (2 * t)
            xr = x.reshape(-1, P, g, 2, t)
            U, V = xr[:, :, :, 0, :], xr[:, :, :, 1, :]
            twv = itw_np[:, s].reshape(1, P, g, 2, t)[:, :, :, 1, :]
            x = np.stack([(U + V) % pp, ((U + pp - V) * twv) % pp],
                         axis=3).reshape(-1, P, N)
        Mi = x.reshape(BLK, P, NB, BLK).transpose(2, 1, 3, 0)

        itwist = np.zeros((P, N), np.uint32)
        itwists = np.zeros((P, N), np.uint32)
        Wi = np.zeros((P, 4 * BLK, 4 * BLK), np.int8)
        for p_i, p in enumerate(self.primes):
            inv0 = np.array(
                [pow(int(v), p - 2, p) for v in Mi[0, p_i, :, 0]],
                dtype=np.uint64)
            for b in range(NB):
                T = (Mi[b, p_i, :, 0] * inv0) % p            # [BLK] rows
                assert np.array_equal((Mi[0, p_i] * T[:, None]) % p,
                                      Mi[b, p_i]), \
                    "inverse tail twist factorization violated"
                itwist[p_i, b * BLK:(b + 1) * BLK] = T
                itwists[p_i, b * BLK:(b + 1) * BLK] = (
                    (T.astype(object) << 32) // p).astype(np.uint64)
            M0 = Mi[0, p_i].astype(np.int64)
            for j in range(4):
                Mj = (M0 << (8 * j)) % p
                Moff = Mj + 0x80808080
                for i in range(4):
                    D = ((Moff >> (8 * i)) & 255) - 128
                    Wi[p_i, j * BLK:(j + 1) * BLK,
                       i * BLK:(i + 1) * BLK] = D.T.astype(np.int8)
        self.mxu_itwr = jnp.asarray(itwist)
        self.mxu_itwrs = jnp.asarray(itwists)
        self.mxu_iw = jnp.asarray(Wi)


@functools.lru_cache(maxsize=None)
def _get_kernel_plan(N: int, primes: tuple, l: int, Bg_bit: int, k: int,
                     bt: int, mxu: bool, rot_ntt: bool) -> PBSKernelPlan:
    return PBSKernelPlan(N, primes, l, Bg_bit, k, bt, mxu=mxu,
                         rot_ntt=rot_ntt)


def get_kernel_plan(N: int, primes: tuple, l: int, Bg_bit: int, k: int,
                    bt: int = DEFAULT_BT, mxu: bool = None,
                    rot_ntt: bool = None) -> PBSKernelPlan:
    """`mxu=None` resolves from the `MOSFHET_NTT_MXU` env var: the kernels
    run their forward-NTT tails / inverse-NTT heads on the int8 MXU
    (`_fwd_ntt_mxu`/`_inv_ntt_mxu`) instead of lane-roll butterflies.
    DEFAULT ON since round 3: measured on v5e at L2, MXU 422 boot/s vs
    roll 329 (+28%), TORUS32 780 vs 660, GA 5.32 ms vs 6.60 — bit-exact
    (kernel==jnp interpret tests run both plans).  Set MOSFHET_NTT_MXU=0
    for the pure lane-roll plan.

    `rot_ntt=None` resolves from `MOSFHET_ROT_NTT` (`ntt.rot_ntt_enabled`):
    the blind-rotate step/partial kernels replace the coefficient-domain
    rotation with the NTT-domain (zeta^a - 1) twiddle multiply."""
    import os
    if mxu is None:
        mxu = os.environ.get("MOSFHET_NTT_MXU", "1") == "1"
    if rot_ntt is None:
        rot_ntt = _ntt.rot_ntt_enabled()
    return _get_kernel_plan(N, primes, l, Bg_bit, k, bt, bool(mxu),
                            bool(rot_ntt))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _decompose_digit(lo, hi, i: int, Bg_bit: int, tb: int = 64):
    """Digit i of the tb-bit value (lo, hi) after the offset add: signed in
    [-Bg/2, Bg/2) as int32 (`polynomial_decompose_i`,
    `/root/reference/src/polynomial.c:74-89`).  For tb = 32 only `lo` is
    used."""
    if tb == 32:
        mask32 = _U32((1 << Bg_bit) - 1)
        v32 = lo >> _U32(32 - (i + 1) * Bg_bit)
        return (v32 & mask32).astype(jnp.int32) - jnp.int32(1 << (Bg_bit - 1))
    shift = 64 - (i + 1) * Bg_bit
    mask = _U32((1 << Bg_bit) - 1)
    half = 1 << (Bg_bit - 1)
    if shift >= 32:
        v = hi >> _U32(shift - 32)
    elif shift + Bg_bit <= 32:
        v = lo >> _U32(shift)
    else:
        v = (lo >> _U32(shift)) | (hi << _U32(32 - shift))
    return (v & mask).astype(jnp.int32) - jnp.int32(half)


def _garner_limbs(ts, kp: PBSKernelPlan):
    """Exact residues ts[m] in [0, p_m) -> value mod 2^64 as (lo, hi) u32.

    Mixed-radix reconstruction with centered top digit, mirroring
    `ntt.garner_u64` in 32-bit limbs."""
    P = kp.P
    primes = kp.primes
    digs = _garner_digits(ts, kp)
    top = digs[-1]
    p_top = primes[P - 1]
    negm = top > _U32(p_top // 2)
    lo = jnp.where(negm, top - _U32(p_top), top)      # two's complement
    hi = jnp.where(negm, _U32(0xFFFFFFFF), _U32(0))
    for m in range(P - 2, -1, -1):
        p = _U32(primes[m])
        new_lo = lo * p
        c1 = _mulhi32(lo, jnp.broadcast_to(p, lo.shape))
        new_hi = hi * p + c1
        lo2 = new_lo + digs[m]
        carry = (lo2 < new_lo).astype(_U32)
        lo, hi = lo2, new_hi + carry
    return lo, hi


def _garner_digits(ts, kp: PBSKernelPlan):
    """Shared mixed-radix digit extraction: exact residues -> Garner digits."""
    P = kp.P
    primes = kp.primes
    digs = [ts[0]]
    for m in range(1, P):
        p = primes[m]
        acc = digs[0]
        for j in range(1, m):
            w, ws = kp.garner_w[m][j]
            term = _shoup_lazy(digs[j], _U32(w), _U32(ws), p)
            acc = _cond_sub(acc + term, 2 * p)
        acc = _exact(acc, p)
        diff = _exact(ts[m] + _U32(p) - acc, p)
        c, cs = kp.garner_cinv[m]
        digs.append(_exact(_shoup_lazy(diff, _U32(c), _U32(cs), p), p))
    return digs


def _garner_limb32(ts, kp: PBSKernelPlan):
    """Exact residues -> value mod 2^32 (single u32 limb; TORUS32 build).
    The mixed-radix Horner wraps mod 2^32, so only low multiplies appear."""
    digs = _garner_digits(ts, kp)
    P = kp.P
    top = digs[-1]
    p_top = kp.primes[P - 1]
    negm = top > _U32(p_top // 2)
    lo = jnp.where(negm, top - _U32(p_top), top)
    for m in range(P - 2, -1, -1):
        lo = lo * _U32(kp.primes[m]) + digs[m]
    return lo


def _ntt_mul_acc_keyfn(kp: PBSKernelPlan, dig_ref, spec_ref, ftw_ref,
                       ftws_ref, liota, mxu_refs, nrows: int, key_fn,
                       barrett: bool = False, dig0=None):
    """spec[c, p] += NTT(dig[dig0 + j]) * key(j, c, p) over rows
    j < nrows (dig0: traced offset into dig_ref, default 0 — used by the
    tensor-parallel partial kernel whose shard owns rows
    [dig0, dig0 + nrows)).

    `key_fn(j, c, p_i)` returns the [BT, N] u32 key row — with its Shoup
    companion as a second element when `barrett=False` (static keys), or
    alone when `barrett=True` (dynamic keys, multiplied with
    `_barrett_lazy`; requires the wide-prime window).

    Default path: fori_loop over rows, lane-roll `_fwd_ntt` per row tile
    (so `key_fn` must accept a traced `j`).  MXU path (`mxu_refs`
    given): one `_fwd_ntt_mxu` over all nrows*BT rows per prime — the
    per-block int8 matmuls then contract at M = nrows*BT >= 128, keeping
    the MXU's full sublane width busy — followed by a statically
    unrolled accumulate."""
    N, P, C, bt = kp.N, kp.P, kp.C, kp.bt
    if barrett:
        assert kp.barrett_ok, (
            "dynamic-key (Barrett) kernels need primes > 2^30/1.75; the "
            "narrow-prime set (MOSFHET_NTT_PRIMES=narrow) cannot run the "
            "unfolded/UBR/GA kernels")

    def mul(s_, j, c, p_i, p):
        if barrett:
            return _barrett_lazy(s_, key_fn(j, c, p_i), p, kp.mup[p_i])
        kv, ks = key_fn(j, c, p_i)
        return _shoup_lazy(s_, kv, ks, p)

    if mxu_refs is not None:
        tw_ref, tws_ref, w_ref = mxu_refs[:3]
        if dig0 is None:
            d_all = dig_ref[:nrows].reshape(nrows * bt, N)
        else:
            d_all = dig_ref[pl.ds(dig0, nrows)].reshape(nrows * bt, N)
        for p_i in range(P):
            p = kp.primes[p_i]
            r = jnp.where(d_all < 0, d_all + jnp.int32(p),
                          d_all).astype(_U32)
            s_all = _fwd_ntt_mxu(r, ftw_ref[p_i], ftws_ref[p_i],
                                 tw_ref[p_i:p_i + 1], tws_ref[p_i:p_i + 1],
                                 w_ref[p_i],
                                 p, kp.s256[p_i], kp.red1[p_i], N,
                                 lazy_out=not barrett).reshape(
                                     nrows, bt, N)
            for j in range(nrows):
                for c in range(C):
                    spec_ref[c, p_i] = _cond_sub(
                        spec_ref[c, p_i] + mul(s_all[j], j, c, p_i, p),
                        2 * p)
        return

    def body(j, carry):
        d = dig_ref[j] if dig0 is None else dig_ref[dig0 + j]
        for p_i in range(P):
            p = kp.primes[p_i]
            r = jnp.where(d < 0, d + jnp.int32(p), d).astype(_U32)
            s_ = _fwd_ntt(r, ftw_ref[p_i], ftws_ref[p_i], liota,
                          p, N, lazy3=kp.lazy3)
            for c in range(C):
                spec_ref[c, p_i] = _cond_sub(
                    spec_ref[c, p_i] + mul(s_, j, c, p_i, p), 2 * p)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nrows), body, jnp.int32(0))


def _ntt_mul_acc(kp: PBSKernelPlan, dig_ref, keyv_ref, keyvs_ref, spec_ref,
                 ftw_ref, ftws_ref, liota, mxu_refs):
    """spec[c, p] += NTT(dig[j]) * key[j, c, p] over all J digit rows
    (static Shoup key resident as [J, C, P, N] + companions)."""
    bt = kp.bt

    def key_fn(j, c, p_i):
        kv = jnp.broadcast_to(keyv_ref[j, c, p_i:p_i + 1, :], (bt, kp.N))
        ks = jnp.broadcast_to(keyvs_ref[j, c, p_i:p_i + 1, :], (bt, kp.N))
        return kv, ks

    _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref, liota,
                       mxu_refs, kp.J, key_fn)


def _inv_ntts(kp: PBSKernelPlan, spec_ref, itw_ref, itws_ref, liota,
              mxu_refs):
    """Inverse NTTs of all C*P spectra -> ts[c][p_i], exact in [0, p).

    MXU path: one `_inv_ntt_mxu` over the C components concatenated on
    sublanes per prime (R = C*BT rows per int8 contraction)."""
    N, P, C, bt = kp.N, kp.P, kp.C, kp.bt
    if mxu_refs is not None:
        itwr_ref, itwrs_ref, iw_ref = mxu_refs[3], mxu_refs[4], mxu_refs[5]
        out = [[None] * P for _ in range(C)]
        for p_i in range(P):
            p = kp.primes[p_i]
            xs = jnp.concatenate([spec_ref[c, p_i] for c in range(C)],
                                 axis=0)
            y = _inv_ntt_mxu(xs, itw_ref[p_i], itws_ref[p_i],
                             itwr_ref[p_i:p_i + 1], itwrs_ref[p_i:p_i + 1],
                             iw_ref[p_i], p, kp.s256[p_i], N)
            for c in range(C):
                out[c][p_i] = y[c * bt:(c + 1) * bt]
        return out
    return [[_inv_ntt(spec_ref[c, p_i], itw_ref[p_i], itws_ref[p_i],
                      liota, kp.primes[p_i], N) for p_i in range(P)]
            for c in range(C)]


def _make_kernel(kp: PBSKernelPlan):
    N, P, C, J, l, Bg_bit = kp.N, kp.P, kp.C, kp.J, kp.l, kp.Bg_bit
    bt = kp.bt

    def kernel(rot_ref, keyv_ref, keyvs_ref, ftw_ref, ftws_ref,
               itw_ref, itws_ref, *rest):
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref, dig_ref, spec_ref = rest[6:]
        else:
            out_ref, dig_ref, spec_ref = rest
            mxu_refs = None
        # rot_ref:  [1, 2, C, BT, N] u32  (limb, component, batch, coeff)
        # keyv/s:   [J, C, P, N] u32      (resident across grid)
        # ftw/s:    [P, S, N];  itw/s: [P, S+1, N]
        # out_ref:  [1, 2, C, BT, N] u32
        # dig_ref:  [J, BT, N] i32 scratch; spec_ref: [C, P, BT, N] u32 scratch
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)

        # -- gadget decomposition of every component ----------------------
        for c in range(C):
            lo = rot_ref[0, 0, c] + _U32(kp.off_lo)
            carry = (lo < _U32(kp.off_lo)).astype(_U32)
            hi = rot_ref[0, 1, c] + _U32(kp.off_hi) + carry
            for i in range(l):
                dig_ref[c * l + i] = _decompose_digit(lo, hi, i, Bg_bit)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        # -- forward NTT per digit row, multiply-accumulate against key ---
        _ntt_mul_acc(kp, dig_ref, keyv_ref, keyvs_ref, spec_ref,
                     ftw_ref, ftws_ref, liota, mxu_refs)

        # -- inverse NTTs + CRT readback ----------------------------------
        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        for c in range(C):
            lo, hi = _garner_limbs(ts_all[c], kp)
            out_ref[0, 0, c] = lo
            out_ref[0, 1, c] = hi

    return kernel


def _cmux_delta_tiles(rot_tiles, keyv, keyvs, kp: PBSKernelPlan,
                      interpret: bool = False):
    """rot_tiles: [nb, 2, C, BT, N] u32 -> delta tiles (same shape)."""
    nb = rot_tiles.shape[0]
    N, P, C, J, bt = kp.N, kp.P, kp.C, kp.J, kp.bt
    S = N.bit_length() - 1
    grid = (nb,)
    kernel = _make_kernel(kp)
    # NB: index-map constants must be i32 and must not capture tracers —
    # python `0` literals trace to i64 under jax_enable_x64 (Mosaic rejects
    # i64 scalars), so derive an i32 zero from the grid index.
    in_specs = [
        pl.BlockSpec((1, 2, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [rot_tiles, keyv, keyvs, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 2, C, bt, N), _U32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, C, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        # bt=64 pushes the stack past the default 16 MiB scoped-vmem limit
        # (measured: batch-1 GA cell, 18.05M) — raise it like the other
        # production kernels
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _mxu_specs(kp: PBSKernelPlan):
    """BlockSpecs for the MXU-tail refs, replicated across the grid:
    forward (column twist, its shoup, int8 limb matrix) then inverse
    (row twist, its shoup, int8 limb matrix)."""
    N, P = kp.N, kp.P
    row = pl.BlockSpec((P, N), lambda i: (i * 0, i * 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((P, 512, 512), lambda i: (i * 0, i * 0, i * 0),
                       memory_space=pltpu.VMEM)
    return [row, row, mat, row, row, mat]


def _mxu_args(kp: PBSKernelPlan):
    return [kp.mxu_tw, kp.mxu_tws, kp.mxu_w,
            kp.mxu_itwr, kp.mxu_itwrs, kp.mxu_iw]


def _mxu_specs3(kp: PBSKernelPlan):
    """As `_mxu_specs`, for kernels on a 3-axis grid."""
    N, P = kp.N, kp.P
    row = pl.BlockSpec((P, N), lambda b, g, m: (b * 0, b * 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((P, 512, 512),
                       lambda b, g, m: (b * 0, b * 0, b * 0),
                       memory_space=pltpu.VMEM)
    return [row, row, mat, row, row, mat]


def _rot_specs(kp: PBSKernelPlan):
    """BlockSpecs for the rot-NTT monomial-spectrum tables
    ([P, logN+1, N] values + Shoup), replicated across the grid."""
    tbl = pl.BlockSpec((kp.P, kp.N.bit_length(), kp.N),
                       lambda i: (i * 0, i * 0, i * 0),
                       memory_space=pltpu.VMEM)
    return [tbl, tbl]


# ---------------------------------------------------------------------------
# Fully-fused blind-rotate step: acc += BK (x) ((X^a - 1) * acc)
# ---------------------------------------------------------------------------

def _neg_u64(lo, hi):
    """Two's-complement negation in u32 limbs."""
    nlo = _U32(0) - lo
    nhi = (_U32(0) - hi) - (lo != _U32(0)).astype(_U32)
    return nlo, nhi


def _negacyclic_rotate_limbs(lo, hi, a_col, liota, N: int):
    """Per-row rotation X^{a} of the u64 polynomial rows (lo, hi) [BT, N],
    a_col: [BT, 1] int32 in [0, 2N] — each batch row rotates by its own
    exponent (the data-dependent rotation of `blind_rotate`,
    `/root/reference/src/bootstrap.c:113-118`).

    Decomposed into log2(N) conditional lane-rolls (bit j of a rolls by
    2^j with negacyclic sign on wrapped lanes) plus a conditional negation
    for the X^N bit; bit log2(2N) (a == 2N) is the identity.
    """
    logN = N.bit_length() - 1
    for j in range(logN):
        s = 1 << j
        bit = ((a_col >> jnp.int32(j)) & jnp.int32(1)) == jnp.int32(1)
        rlo = pltpu.roll(lo, jnp.int32(s), 1)
        rhi = pltpu.roll(hi, jnp.int32(s), 1)
        wrapped = liota < _U32(s)
        nlo, nhi = _neg_u64(rlo, rhi)
        cand_lo = jnp.where(wrapped, nlo, rlo)
        cand_hi = jnp.where(wrapped, nhi, rhi)
        lo = jnp.where(bit, cand_lo, lo)
        hi = jnp.where(bit, cand_hi, hi)
    bit_n = ((a_col >> jnp.int32(logN)) & jnp.int32(1)) == jnp.int32(1)
    nlo, nhi = _neg_u64(lo, hi)
    lo = jnp.where(bit_n, nlo, lo)
    hi = jnp.where(bit_n, nhi, hi)
    return lo, hi


def _take_lanes(x, idx):
    """take_along_axis(axis=1) on a [BT, L<=128] tile via lax.gather with
    i32 indices — the exact GatherDimensionNumbers Mosaic lowers to ONE
    `tpu.dynamic_gather` (jnp.take_along_axis inserts an i64 index cast
    under x64 mode, which Mosaic rejects).  HARDWARE CONSTRAINT (measured
    on v5e, round 4): the source may span only ONE vreg along the gather
    (lane) dimension — L must be <= 128 ("Multiple source vregs along
    gather dimension" otherwise).  Wide gathers go through
    `_take_lanes_wide`."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        x, idx[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


_GATHER_LANES = 128  # one vreg along lanes: Mosaic dynamic_gather's limit


def _take_lanes_wide(x, gidx, N: int):
    """out[:, j] = x[:, gidx[:, j]] on a [BT, N] tile, N a multiple of 128.

    Mosaic's `tpu.dynamic_gather` handles one source vreg along lanes, so
    the wide gather is factorized: write gidx = 128*Q + R.  Because 128 |
    N and the GA index map is linear (gidx[j] = (ginv*j mod 2N) mod N),
    R = gidx mod 128 depends only on j mod 128 — every 128-lane chunk of
    the source is gathered with the SAME per-row index vector (one
    single-vreg dynamic_gather per chunk), then each output chunk selects
    per lane among the 16 gathered candidates by Q (compare+select tree,
    all full-vreg VPU ops).  Exact for any gidx whose low 7 bits are
    lane-periodic; asserted by construction in `_galois_permute_limbs`."""
    L = _GATHER_LANES
    if N <= L:
        return _take_lanes(x, gidx)
    nchunks = N // L
    r = gidx[:, :L] & jnp.int32(L - 1)          # [BT, 128] per-row lane idx
    q_arr = gidx >> jnp.int32(L.bit_length() - 1)  # [BT, N] chunk selector
    gathered = [_take_lanes(x[:, q * L:(q + 1) * L], r)
                for q in range(nchunks)]
    outs = []
    for a in range(nchunks):
        qa = q_arr[:, a * L:(a + 1) * L]
        acc = gathered[0]
        for q in range(1, nchunks):
            acc = jnp.where(qa == jnp.int32(q), gathered[q], acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _galois_permute_limbs(lo, hi, ginv_col, N: int):
    """Per-row Galois permutation psi_gen (x^i -> x^(gen*i)) of u64
    polynomial rows (lo, hi) [BT, N]; ginv_col [BT, 1] i32 holds gen^-1
    mod 2N per row.  out[j] = +- in[(j*ginv mod 2N) mod N] — a factorized
    dynamic lane gather per limb (`_take_lanes_wide`: one single-vreg
    gather per 128-lane chunk + a Q-select combine, the form v5e Mosaic
    compiles) plus a conditional two's-complement negation, replacing the
    log2(N/2)+1 conditional XLA gather stages of
    `bootstrap_ga._permute_log` (`polynomial_permute`,
    `/root/reference/src/polynomial.c:439-450`)."""
    j = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
    ic = (j * ginv_col) & jnp.int32(2 * N - 1)
    gidx = ic & jnp.int32(N - 1)
    neg = (ic & jnp.int32(N)) != 0
    glo = _take_lanes_wide(lo, gidx, N)
    if hi is None:
        return jnp.where(neg, _U32(0) - glo, glo), None
    ghi = _take_lanes_wide(hi, gidx, N)
    nlo, nhi = _neg_u64(glo, ghi)
    return jnp.where(neg, nlo, glo), jnp.where(neg, nhi, ghi)


def _negacyclic_rotate_limb32(lo, a_col, liota, N: int):
    """Single-limb (TORUS32) per-row rotation X^{a}."""
    logN = N.bit_length() - 1
    for j in range(logN):
        s = 1 << j
        bit = ((a_col >> jnp.int32(j)) & jnp.int32(1)) == jnp.int32(1)
        rlo = pltpu.roll(lo, jnp.int32(s), 1)
        wrapped = liota < _U32(s)
        cand = jnp.where(wrapped, _U32(0) - rlo, rlo)
        lo = jnp.where(bit, cand, lo)
    bit_n = ((a_col >> jnp.int32(logN)) & jnp.int32(1)) == jnp.int32(1)
    return jnp.where(bit_n, _U32(0) - lo, lo)


def _rot_twiddle(a_col, rot_tw_ref, rot_tws_ref, p_i, p: int, bt: int,
                 N: int):
    """t = zeta^a - 1 per batch row: [BT, N] u32 in [0, p-1).

    logN+1 conditional Shoup multiplies over the set bits of a (the
    kernel counterpart of `ntt.xpow`; bit log2(2N) — a == 2N — is the
    identity).  zeta^a is a power of a root of unity so never 0; the
    plain -1 stays canonical."""
    x = jnp.ones((bt, N), _U32)
    for j in range(N.bit_length()):                      # logN + 1 rows
        w = jnp.broadcast_to(rot_tw_ref[p_i, j:j + 1, :], (bt, N))
        ws = jnp.broadcast_to(rot_tws_ref[p_i, j:j + 1, :], (bt, N))
        bit = ((a_col >> jnp.int32(j)) & jnp.int32(1)) == jnp.int32(1)
        xm = _exact(_shoup_lazy(x, w, ws, p), p)
        x = jnp.where(bit, xm, x)
    return x - _U32(1)


def _decompose_acc(kp: PBSKernelPlan, acc_ref, dig_ref, a_col, liota,
                   rotate: bool):
    """Shared front of the step/partial kernels: read the accumulator limb
    tiles, optionally form X^a*acc - acc in coefficient space (the classic
    step), and write the gadget digits.  Returns the raw acc limb pairs
    (for the final carry add).  With rotate=False (rot-NTT step) the
    accumulator itself is decomposed; the (X^a - 1) factor is applied
    later in the NTT domain (`_rot_twiddle`)."""
    N, C, l, Bg_bit = kp.N, kp.C, kp.l, kp.Bg_bit
    acc = []
    for c in range(C):
        if kp.nl == 1:
            alo = acc_ref[0, 0, c]
            acc.append((alo, None))
            base = (_negacyclic_rotate_limb32(alo, a_col, liota, N) - alo
                    ) if rotate else alo
            lo = base + _U32(kp.off_lo)          # mod 2^32 throughout
            for i in range(l):
                dig_ref[c * l + i] = _decompose_digit(
                    lo, None, i, Bg_bit, tb=32)
            continue
        alo = acc_ref[0, 0, c]
        ahi = acc_ref[0, 1, c]
        acc.append((alo, ahi))
        if rotate:
            rlo, rhi = _negacyclic_rotate_limbs(alo, ahi, a_col, liota, N)
            # rot = X^a * acc - acc  (u64 subtract in limbs)
            slo = rlo - alo
            borrow = (rlo < alo).astype(_U32)
            shi = rhi - ahi - borrow
        else:
            slo, shi = alo, ahi
        # gadget decomposition
        lo = slo + _U32(kp.off_lo)
        carry = (lo < _U32(kp.off_lo)).astype(_U32)
        hi = shi + _U32(kp.off_hi) + carry
        for i in range(l):
            dig_ref[c * l + i] = _decompose_digit(lo, hi, i, Bg_bit)
    return acc


def _apply_rot_twiddle(kp: PBSKernelPlan, spec_ref, a_col, rot_tw_ref,
                       rot_tws_ref):
    """spec[c, p] *= (zeta^a - 1) — the NTT-domain (X^a - 1) factor of the
    rotation-free step.  Input lazy (< 2p), output lazy (< 2p); the
    twiddle is shared across components (it depends only on a)."""
    for p_i in range(kp.P):
        p = kp.primes[p_i]
        t = _rot_twiddle(a_col, rot_tw_ref, rot_tws_ref, p_i, p, kp.bt,
                         kp.N)
        for c in range(kp.C):
            spec_ref[c, p_i] = _barrett_lazy(spec_ref[c, p_i], t, p,
                                             kp.mup[p_i])


def _step_body(kp: PBSKernelPlan, acc_ref, a_col, keyv_ref, keyvs_ref,
               ftw_ref, ftws_ref, itw_ref, itws_ref, mxu_refs, rot_refs,
               out_ref, dig_ref, spec_ref, liota):
    """One CMUX step: read acc limbs (into registers), rotate + decompose,
    forward NTTs + mul-acc vs the step's key rows, inverse NTTs, garner,
    carry-add, write the new acc limbs to `out_ref`.  Shared verbatim by
    the per-step kernel and the whole-scan fused kernel (`acc_ref` may BE
    `out_ref` there — safe because the acc values are register-resident
    before the first write)."""
    C, P = kp.C, kp.P
    acc = _decompose_acc(kp, acc_ref, dig_ref, a_col, liota,
                         rotate=not kp.rot_ntt)

    for c in range(C):
        for p in range(P):
            spec_ref[c, p] = jnp.zeros((kp.bt, kp.N), _U32)

    _ntt_mul_acc(kp, dig_ref, keyv_ref, keyvs_ref, spec_ref,
                 ftw_ref, ftws_ref, liota, mxu_refs)

    if kp.rot_ntt:
        _apply_rot_twiddle(kp, spec_ref, a_col, rot_refs[0], rot_refs[1])

    ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                       mxu_refs)
    for c in range(C):
        ts = ts_all[c]
        if kp.nl == 1:
            dlo = _garner_limb32(ts, kp)
            out_ref[0, 0, c] = acc[c][0] + dlo      # mod 2^32
            continue
        dlo, dhi = _garner_limbs(ts, kp)
        alo, ahi = acc[c]
        olo = alo + dlo
        carry = (olo < alo).astype(_U32)
        out_ref[0, 0, c] = olo
        out_ref[0, 1, c] = ahi + dhi + carry


def _make_step_kernel(kp: PBSKernelPlan):
    bt = kp.bt

    def kernel(acc_ref, a_ref, keyv_ref, keyvs_ref, ftw_ref, ftws_ref,
               itw_ref, itws_ref, *rest):
        # acc_ref/out_ref: [1, 2, C, BT, N] u32 limbs of the accumulator
        # a_ref: [1, BT, 1] i32 rotation exponents in [0, 2N]
        rest = list(rest)
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            rest = rest[6:]
        else:
            mxu_refs = None
        if kp.rot_ntt:
            rot_refs = tuple(rest[:2])
            rest = rest[2:]
        else:
            rot_refs = None
        out_ref, dig_ref, spec_ref = rest
        liota = jax.lax.broadcasted_iota(_U32, (bt, kp.N), 1)
        a_col = a_ref[0]                                   # [BT, 1] i32
        _step_body(kp, acc_ref, a_col, keyv_ref, keyvs_ref, ftw_ref,
                   ftws_ref, itw_ref, itws_ref, mxu_refs, rot_refs,
                   out_ref, dig_ref, spec_ref, liota)

    return kernel


def _pbs_step_tiles(acc_tiles, a_tiles, keyv, keyvs, kp: PBSKernelPlan,
                    interpret: bool = False):
    """One fused blind-rotate step on limb tiles.

    acc_tiles: [nb, nl, C, BT, N] u32; a_tiles: [nb, BT, 1] i32."""
    nb = acc_tiles.shape[0]
    N, P, C, J, bt = kp.N, kp.P, kp.C, kp.J, kp.bt
    nl = kp.nl
    S = N.bit_length() - 1
    kernel = _make_step_kernel(kp)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 1), lambda i: (i, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((J, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [acc_tiles, a_tiles, keyv, keyvs, kp.ftw, kp.ftws, kp.itw,
            kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    if kp.rot_ntt:
        in_specs += _rot_specs(kp)
        args += [kp.rot_tw, kp.rot_tws]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def split_limbs(x, kp: PBSKernelPlan):
    """[B, C, N] torus -> [nb, nl, C, BT, N] u32 limb tiles."""
    B, C, N = x.shape
    bt = kp.bt
    nb = B // bt
    if kp.nl == 1:
        t = jnp.asarray(x, _U32)[None]             # [1, B, C, N]
    else:
        lo = (x & jnp.uint64(0xFFFFFFFF)).astype(_U32)
        hi = (x >> jnp.uint64(32)).astype(_U32)
        t = jnp.stack([lo, hi])                    # [2, B, C, N]
    return t.reshape(kp.nl, nb, bt, C, N).transpose(1, 0, 3, 2, 4)


def merge_limbs(t):
    """[nb, nl, C, BT, N] u32 -> [B, C, N] torus."""
    nb, nl, C, bt, N = t.shape
    t = t.transpose(1, 0, 3, 2, 4).reshape(nl, nb * bt, C, N)
    if nl == 1:
        return t[0]
    return t[0].astype(jnp.uint64) | (t[1].astype(jnp.uint64)
                                      << jnp.uint64(32))


def blind_rotate_scan(acc0, a_int, keyv32, keyvs32, kp: PBSKernelPlan,
                      interpret: bool = False):
    """The full n-step CMUX chain with the fused step kernel.

    acc0: [B, C, N] u64 (B a multiple of the tile size)
    a_int: [n, B] int32 rotation exponents in [0, 2N]
    keyv32/keyvs32: [n, J, C, P, N] u32 bootstrap key (+ Shoup)
    Scan state stays in u32 limb tiles — no u64 ops inside the loop.
    """
    # DEFAULT since round 5: measured 450.9 vs 441.0 boot/s @ L2 batch
    # 256 and 466.3 vs 460.1 @ 512 (decrypt-OK both) — the whole-scan
    # single-pallas_call form wins at both batches.
    if _os.environ.get("MOSFHET_FUSED_SCAN", "1") == "1":
        return blind_rotate_scan_fused(acc0, a_int, keyv32, keyvs32, kp,
                                       interpret=interpret)
    B = acc0.shape[0]
    nb = B // kp.bt
    tiles = split_limbs(acc0, kp)
    a_tiles = a_int.reshape(a_int.shape[0], nb, kp.bt, 1)

    def step(carry, xs):
        v32, vs32, ai = xs
        return _pbs_step_tiles(carry, ai, v32, vs32, kp,
                               interpret=interpret), None

    out, _ = jax.lax.scan(step, tiles, (keyv32, keyvs32, a_tiles))
    return merge_limbs(out)


def _make_scan_kernel(kp: PBSKernelPlan):
    """Whole-scan kernel body: grid (nb, n), step axis innermost.  The
    accumulator lives in the OUTPUT block, whose index depends only on the
    batch tile — Mosaic's pipeline keeps a revisited block in VMEM and
    writes it back to HBM once, when the batch index changes.  Step i==0
    seeds it from the acc0 input block.  The per-step bootstrap-key block
    is indexed by the step axis, so the pipeline prefetches step i+1's key
    rows during step i's compute — the double-buffered key streaming that
    the lax.scan form (one pallas_call per step) cannot express."""
    bt = kp.bt

    def kernel(acc_ref, a_ref, keyv_ref, keyvs_ref, ftw_ref, ftws_ref,
               itw_ref, itws_ref, *rest):
        rest = list(rest)
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            rest = rest[6:]
        else:
            mxu_refs = None
        if kp.rot_ntt:
            rot_refs = tuple(rest[:2])
            rest = rest[2:]
        else:
            rot_refs = None
        out_ref, dig_ref, spec_ref = rest
        liota = jax.lax.broadcasted_iota(_U32, (bt, kp.N), 1)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _seed():
            out_ref[...] = acc_ref[...]

        a_col = a_ref[0]                                   # [BT, 1] i32
        _step_body(kp, out_ref, a_col, keyv_ref, keyvs_ref, ftw_ref,
                   ftws_ref, itw_ref, itws_ref, mxu_refs, rot_refs,
                   out_ref, dig_ref, spec_ref, liota)

    return kernel


def blind_rotate_scan_fused(acc0, a_int, keyv32, keyvs32,
                            kp: PBSKernelPlan, interpret: bool = False):
    """`blind_rotate_scan` as ONE pallas_call (bit-identical step body,
    `_step_body`): no per-step dispatch, no per-step HBM round trip of the
    accumulator, and hardware-pipelined (double-buffered) key streaming.
    Enabled by MOSFHET_FUSED_SCAN=1."""
    B = acc0.shape[0]
    nb = B // kp.bt
    n = a_int.shape[0]
    N, P, C, J, bt, nl = kp.N, kp.P, kp.C, kp.J, kp.bt, kp.nl
    S = N.bit_length() - 1
    tiles = split_limbs(acc0, kp)
    a_tiles = a_int.reshape(n, nb, kp.bt, 1)
    kernel = _make_scan_kernel(kp)

    z = lambda b, i: (b, i * 0, i * 0, i * 0, i * 0)        # acc/out maps
    const3 = lambda b, i: (b * 0, i * 0, i * 0)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N), z, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, bt, 1), lambda b, i: (i, b, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, J, C, P, N),
                     lambda b, i: (i, b * 0, b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, J, C, P, N),
                     lambda b, i: (i, b * 0, b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), const3, memory_space=pltpu.VMEM),
    ]
    args = [tiles, a_tiles, keyv32, keyvs32, kp.ftw, kp.ftws, kp.itw,
            kp.itws]
    if kp.use_mxu:
        row = pl.BlockSpec((P, N), lambda b, i: (b * 0, i * 0),
                           memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((P, 512, 512),
                           lambda b, i: (b * 0, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
        in_specs += [row, row, mat, row, row, mat]
        args += _mxu_args(kp)
    if kp.rot_ntt:
        tbl = pl.BlockSpec((P, N.bit_length(), N), const3,
                           memory_space=pltpu.VMEM)
        in_specs += [tbl, tbl]
        args += [kp.rot_tw, kp.rot_tws]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N), z,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


# ---------------------------------------------------------------------------
# Gadget-axis (tensor-parallel) split step: partial NTT-domain accumulator
# over a local slice of the key's J rows, psum'd outside by the caller
# (`parallel.mesh`), then finished (inverse NTT + garner + carry add).
# ---------------------------------------------------------------------------

def _make_partial_step_kernel(kp: PBSKernelPlan, j_local: int):
    """Rotate + decompose + forward NTT + mul-acc over key rows
    [j0, j0 + j_local); emits the *exact* (< p) NTT-domain partial so the
    caller's cross-shard psum of m partials stays < m*p (u32-exact for
    m*p < 2^32).  Decomposition math is bit-identical to
    `_make_step_kernel`; only the J loop bounds differ."""
    N, P, C, J, l, Bg_bit = kp.N, kp.P, kp.C, kp.J, kp.l, kp.Bg_bit
    bt = kp.bt

    def kernel(j0_ref, acc_ref, a_ref, keyv_ref, keyvs_ref, ftw_ref,
               ftws_ref, *rest):
        # acc_ref: [1, nl, C, BT, N] u32; a_ref: [1, BT, 1] i32
        # keyv/s: [j_local, C, P, N] u32 (this shard's key rows)
        # j0_ref: [1] i32 in SMEM — global index of the first local row
        # spec_out_ref: [1, C, P, BT, N] u32, each value in [0, p)
        rest = list(rest)
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            rest = rest[6:]
        else:
            mxu_refs = None
        if kp.rot_ntt:
            rot_tw_ref, rot_tws_ref = rest[:2]
            rest = rest[2:]
        spec_out_ref, dig_ref, spec_ref = rest
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        a_col = a_ref[0]
        j0 = j0_ref[0]

        _decompose_acc(kp, acc_ref, dig_ref, a_col, liota,
                       rotate=not kp.rot_ntt)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        def key_fn(j, c, p_i):
            kv = jnp.broadcast_to(keyv_ref[j, c, p_i:p_i + 1, :], (bt, N))
            ks = jnp.broadcast_to(keyvs_ref[j, c, p_i:p_i + 1, :],
                                  (bt, N))
            return kv, ks

        _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                           liota, mxu_refs, j_local, key_fn, dig0=j0)

        if kp.rot_ntt:
            # (zeta^a - 1) ⊙ local partial: t is scalar per (row, lane)
            # so it commutes with the cross-shard psum
            _apply_rot_twiddle(kp, spec_ref, a_col, rot_tw_ref,
                               rot_tws_ref)

        for c in range(C):
            for p_i in range(P):
                spec_out_ref[0, c, p_i] = _exact(spec_ref[c, p_i],
                                                 kp.primes[p_i])

    return kernel


def partial_step_tiles(acc_tiles, a_tiles, j0, keyv, keyvs,
                       kp: PBSKernelPlan, interpret: bool = False):
    """Partial blind-rotate step over this shard's key rows.

    acc_tiles: [nb, nl, C, BT, N] u32; a_tiles: [nb, BT, 1] i32;
    j0: [1] i32; keyv/keyvs: [j_local, C, P, N] u32.
    Returns the NTT-domain partial [nb, C, P, BT, N] u32, values < p."""
    nb = acc_tiles.shape[0]
    N, P, C, bt, nl = kp.N, kp.P, kp.C, kp.bt, kp.nl
    j_local = keyv.shape[0]
    S = N.bit_length() - 1
    kernel = _make_partial_step_kernel(kp, j_local)
    in_specs = [
        # explicit i32 index map: a bare SMEM spec gets an auto-
        # synthesized map whose constants are i64 under x64 mode, and
        # Mosaic fails to legalize the i64 func.return
        pl.BlockSpec((1,), lambda i: (i * 0,),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 1), lambda i: (i, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((j_local, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((j_local, C, P, N),
                     lambda i: (i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [j0, acc_tiles, a_tiles, keyv, keyvs, kp.ftw, kp.ftws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    if kp.rot_ntt:
        in_specs += _rot_specs(kp)
        args += [kp.rot_tw, kp.rot_tws]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, C, P, bt, N), _U32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, P, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kp.J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_finish_step_kernel(kp: PBSKernelPlan, n_sub: int):
    """Inverse NTT + garner of the psum'd spec (< (2*n_sub + 2)*p per
    value) and carry add — the tail of `_make_step_kernel`."""
    N, P, C = kp.N, kp.P, kp.C
    bt = kp.bt

    def kernel(acc_ref, spec_ref, itw_ref, itws_ref, *rest):
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref = rest[6]
        else:
            (out_ref,) = rest
            mxu_refs = None
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        red = [[None] * P for _ in range(C)]       # psum -> [0, 2p)
        for c in range(C):
            for p_i in range(P):
                p = kp.primes[p_i]
                s = spec_ref[0, c, p_i]
                for _ in range(n_sub):
                    s = _cond_sub(s, 2 * p)
                red[c][p_i] = s
        if mxu_refs is not None:
            itwr_ref, itwrs_ref, iw_ref = mxu_refs[3:]
            ts_all = [[None] * P for _ in range(C)]
            for p_i in range(P):
                p = kp.primes[p_i]
                xs = jnp.concatenate([red[c][p_i] for c in range(C)],
                                     axis=0)
                y = _inv_ntt_mxu(xs, itw_ref[p_i], itws_ref[p_i],
                                 itwr_ref[p_i:p_i + 1],
                                 itwrs_ref[p_i:p_i + 1],
                                 iw_ref[p_i], p, kp.s256[p_i], N)
                for c in range(C):
                    ts_all[c][p_i] = y[c * bt:(c + 1) * bt]
        else:
            ts_all = [[_inv_ntt(red[c][p_i], itw_ref[p_i], itws_ref[p_i],
                                liota, kp.primes[p_i], N)
                       for p_i in range(P)] for c in range(C)]
        for c in range(C):
            ts = ts_all[c]
            if kp.nl == 1:
                dlo = _garner_limb32(ts, kp)
                out_ref[0, 0, c] = acc_ref[0, 0, c] + dlo
                continue
            dlo, dhi = _garner_limbs(ts, kp)
            alo = acc_ref[0, 0, c]
            ahi = acc_ref[0, 1, c]
            olo = alo + dlo
            carry = (olo < alo).astype(_U32)
            out_ref[0, 0, c] = olo
            out_ref[0, 1, c] = ahi + dhi + carry

    return kernel


def finish_step_tiles(acc_tiles, spec, kp: PBSKernelPlan, n_parts: int,
                      interpret: bool = False):
    """Finish a TP blind-rotate step: acc + garner(invntt(spec)).

    spec: [nb, C, P, BT, N] u32 — the psum of `n_parts` exact partials
    (each < p), so values are < n_parts * p; requires n_parts * p < 2^32
    (checked by the caller)."""
    nb = acc_tiles.shape[0]
    N, P, C, bt, nl = kp.N, kp.P, kp.C, kp.bt, kp.nl
    S = N.bit_length() - 1
    n_sub = max(0, (n_parts - 1) // 2)       # < n_parts*p -> < 2p
    kernel = _make_finish_step_kernel(kp, n_sub)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, P, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [acc_tiles, spec, kp.itw, kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _limbs_to_resi(lo, hi, kp: PBSKernelPlan, p_i: int):
    """Centered residue mod p of the torus value held in u32 limbs.

    (lo, hi) represent v mod 2^64 (hi is None under TORUS32: v = lo mod
    2^32); the residue returned is that of the *centered* representative
    v - 2^TB * [v >= 2^(TB-1)], matching `ntt.to_resi_u64`.  Output lazy in
    [0, 2p).  Uses only Shoup multiplies with per-plan constants:
    w=1 (reduces any u32 mod p) and w=2^32 mod p."""
    p = kp.primes[p_i]
    red1 = kp.red1[p_i]
    if hi is None:
        t0 = _shoup_lazy(lo, _U32(1), _U32(red1), p)         # lo mod p, < 2p
        sign = lo >> _U32(31)
        c32, _ = kp.c32[p_i]
        adj = jnp.where(sign == _U32(1), _U32(2 * p - c32), _U32(0))
        return _cond_sub(_cond_sub(t0, p) + adj, 2 * p)
    c32, c32s = kp.c32[p_i]
    t0 = _shoup_lazy(lo, _U32(1), _U32(red1), p)             # < 2p
    t1 = _shoup_lazy(hi, _U32(c32), _U32(c32s), p)           # < 2p
    s = _cond_sub(t0 + t1, 2 * p)                            # < 2p
    sign = hi >> _U32(31)
    adj = jnp.where(sign == _U32(1), _U32(2 * p - kp.c64m[p_i]), _U32(0))
    return _cond_sub(s + adj, 2 * p)


# ---------------------------------------------------------------------------
# Apply kernel: scanned external products with a *dynamic* key (replace mode)
#
#   acc_{g+1} = SA_g (x) acc_g
#
# The unfolded blind rotate (`blind_rotate_unfolded`, reference
# `src/bootstrap.c:124-148`) and the UBR multi-value phase 2
# (`multivalue_bootstrap_UBR_phase2`, `bootstrap.c:176-190`) both reduce to
# this: a chain of external products against per-step combined TRGSWs whose
# values are runtime data (no precomputed Shoup companions), multiplied with
# `_barrett_lazy`.  `per_row=True` gives every batch row its own key (the
# batched unfolded rotate); False broadcasts one key over the batch tile
# (one ciphertext, many LUTs — the amortized UBR mode).
# ---------------------------------------------------------------------------

def _decompose_to_digits(acc_limbs, dig_ref, kp: PBSKernelPlan):
    """Gadget-decompose the accumulator components into dig_ref[J]."""
    l, Bg_bit, C = kp.l, kp.Bg_bit, kp.C
    for c in range(C):
        alo, ahi = acc_limbs[c]
        if kp.nl == 1:
            lo = alo + _U32(kp.off_lo)
            for i in range(l):
                dig_ref[c * l + i] = _decompose_digit(lo, None, i, Bg_bit,
                                                      tb=32)
            continue
        lo = alo + _U32(kp.off_lo)
        carry = (lo < _U32(kp.off_lo)).astype(_U32)
        hi = ahi + _U32(kp.off_hi) + carry
        for i in range(l):
            dig_ref[c * l + i] = _decompose_digit(lo, hi, i, Bg_bit)


def _make_apply_kernel(kp: PBSKernelPlan, per_row: bool):
    N, P, C, J = kp.N, kp.P, kp.C, kp.J
    bt = kp.bt

    def kernel(acc_ref, keyv_ref, ftw_ref, ftws_ref, itw_ref, itws_ref,
               *rest):
        # acc_ref/out_ref: [1, nl, C, BT, N] u32
        # keyv_ref: [1, J, C, P, BT, N] (per_row) or [J, C, P, N] (broadcast)
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref, dig_ref, spec_ref = rest[6:]
        else:
            out_ref, dig_ref, spec_ref = rest
            mxu_refs = None
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)

        def key_row(j, c, p_i):
            if per_row:
                return keyv_ref[0, j, c, p_i]                # [BT, N]
            return jnp.broadcast_to(
                keyv_ref[j, c, p_i:p_i + 1, :], (bt, N))

        acc_limbs = []
        for c in range(C):
            alo = acc_ref[0, 0, c]
            ahi = acc_ref[0, 1, c] if kp.nl == 2 else None
            acc_limbs.append((alo, ahi))
        _decompose_to_digits(acc_limbs, dig_ref, kp)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                           liota, mxu_refs, J, key_row, barrett=True)

        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        for c in range(C):
            ts = ts_all[c]
            if kp.nl == 1:
                out_ref[0, 0, c] = _garner_limb32(ts, kp)
                continue
            dlo, dhi = _garner_limbs(ts, kp)
            out_ref[0, 0, c] = dlo
            out_ref[0, 1, c] = dhi

    return kernel


def _apply_step_tiles(acc_tiles, key_g, kp: PBSKernelPlan, per_row: bool,
                      interpret: bool = False):
    """One replace-mode external product on limb tiles.

    acc_tiles: [nb, nl, C, BT, N] u32
    key_g: [nb, J, C, P, BT, N] u32 (per_row) or [J, C, P, N] u32."""
    nb = acc_tiles.shape[0]
    N, P, C, J, bt, nl = kp.N, kp.P, kp.C, kp.J, kp.bt, kp.nl
    S = N.bit_length() - 1
    kernel = _make_apply_kernel(kp, per_row)
    if per_row:
        key_spec = pl.BlockSpec(
            (1, J, C, P, bt, N),
            lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM)
    else:
        key_spec = pl.BlockSpec(
            (J, C, P, N), lambda i: (i * 0, i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        key_spec,
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [acc_tiles, key_g, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def ext_product_apply_scan(acc0, sa32, kp: PBSKernelPlan,
                           per_row: bool = False, interpret: bool = False):
    """Scanned replace-mode external products: acc <- SA_g (x) acc.

    acc0: [B, C, N] torus (B a multiple of the tile; pad upstream)
    sa32: [G, J, C, P, N] u32 exact residues (broadcast over the batch), or
          [G, B, J, C, P, N] (per-row keys, B matching acc0).
    Bit-identical to the jnp scan in
    `bootstrap.multivalue_bootstrap_UBR_phase2`.

    Default (MOSFHET_FUSED_SCAN=1): one pallas_call over grid (nb, G)
    with the accumulator VMEM-resident and the per-step keys pipelined,
    same pattern as `blind_rotate_scan_fused`."""
    B = acc0.shape[0]
    nb = B // kp.bt
    tiles = split_limbs(acc0, kp)
    if per_row:
        G = sa32.shape[0]
        J, C, P, N = kp.J, kp.C, kp.P, kp.N
        sa32 = sa32.reshape(G, nb, kp.bt, J, C, P, N) \
                   .transpose(0, 1, 3, 4, 5, 2, 6)    # [G, nb, J, C, P, BT, N]

    if _os.environ.get("MOSFHET_FUSED_SCAN", "1") == "1":
        return _apply_scan_fused(tiles, sa32, kp, per_row,
                                 interpret=interpret)

    def step(carry, key_g):
        return _apply_step_tiles(carry, key_g, kp, per_row,
                                 interpret=interpret), None

    out, _ = jax.lax.scan(step, tiles, sa32)
    return merge_limbs(out)


def _make_apply_scan_kernel(kp: PBSKernelPlan, per_row: bool):
    bt = kp.bt

    def kernel(acc_ref, keyv_ref, ftw_ref, ftws_ref, itw_ref, itws_ref,
               *rest):
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref, dig_ref, spec_ref = rest[6:]
        else:
            out_ref, dig_ref, spec_ref = rest
            mxu_refs = None
        liota = jax.lax.broadcasted_iota(_U32, (bt, kp.N), 1)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _seed():
            out_ref[...] = acc_ref[...]

        def key_row(j, c, p_i):
            if per_row:
                return keyv_ref[0, j, c, p_i]                # [BT, N]
            return jnp.broadcast_to(
                keyv_ref[j, c, p_i:p_i + 1, :], (bt, kp.N))

        acc_limbs = []
        for c in range(kp.C):
            alo = out_ref[0, 0, c]
            ahi = out_ref[0, 1, c] if kp.nl == 2 else None
            acc_limbs.append((alo, ahi))
        _decompose_to_digits(acc_limbs, dig_ref, kp)

        for c in range(kp.C):
            for p in range(kp.P):
                spec_ref[c, p] = jnp.zeros((bt, kp.N), _U32)

        _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                           liota, mxu_refs, kp.J, key_row, barrett=True)

        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        for c in range(kp.C):
            ts = ts_all[c]
            if kp.nl == 1:
                out_ref[0, 0, c] = _garner_limb32(ts, kp)
                continue
            dlo, dhi = _garner_limbs(ts, kp)
            out_ref[0, 0, c] = dlo
            out_ref[0, 1, c] = dhi

    return kernel


def _apply_scan_fused(tiles, sa32, kp: PBSKernelPlan, per_row: bool,
                      interpret: bool = False):
    """`ext_product_apply_scan` as one pallas_call (grid (nb, G), acc in a
    revisited VMEM block, step keys pipelined)."""
    nb = tiles.shape[0]
    N, P, C, J, bt, nl = kp.N, kp.P, kp.C, kp.J, kp.bt, kp.nl
    G = sa32.shape[0]
    S = N.bit_length() - 1
    kernel = _make_apply_scan_kernel(kp, per_row)
    z5 = lambda b, i: (b, i * 0, i * 0, i * 0, i * 0)
    c3 = lambda b, i: (b * 0, i * 0, i * 0)
    if per_row:
        key_spec = pl.BlockSpec(
            (None, 1, J, C, P, bt, N),
            lambda b, i: (i, b, i * 0, i * 0, i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM)
    else:
        key_spec = pl.BlockSpec(
            (None, J, C, P, N),
            lambda b, i: (i, b * 0, b * 0, b * 0, b * 0),
            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N), z5, memory_space=pltpu.VMEM),
        key_spec,
        pl.BlockSpec((P, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), c3, memory_space=pltpu.VMEM),
    ]
    args = [tiles, sa32, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        row = pl.BlockSpec((P, N), lambda b, i: (b * 0, i * 0),
                           memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((P, 512, 512),
                           lambda b, i: (b * 0, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
        in_specs += [row, row, mat, row, row, mat]
        args += _mxu_args(kp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb, G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N), z5,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


# ---------------------------------------------------------------------------
# TLWE keyswitch kernel (`tlwe_keyswitch`, reference `tlwe.c:289-303`)
#
#   out = (0, b) - sum_{i<n_in, j<t, d_ij != 0} KS[i][j][d_ij - 1]
#
# The reference's `if aij != 0` table subtraction becomes, per (i, j), a
# (base-1)-way select chain over the table rows resident in VMEM followed
# by one u64-limb accumulate.  The table streams through VMEM in n_in
# chunks (grid dim) while the accumulator lives in scratch — XLA's gather
# formulation materializes [batch, chunk, t, n_out] u64 temporaries
# instead and runs ~4x slower at L2.
# ---------------------------------------------------------------------------

def _make_tlwe_ks_kernel(chunk_i: int, t: int, base_m1: int, npad: int,
                         bt: int, nl: int, n_chunks: int):
    def kernel(*refs):
        dig_ref = refs[0]
        tlo_ref = refs[1]
        i = 2
        thi_ref = None
        if nl == 2:
            thi_ref = refs[i]
            i += 1
        out_ref = refs[i]
        alo_ref = refs[i + 1]
        ahi_ref = refs[i + 2] if nl == 2 else None
        ch = pl.program_id(1)

        @pl.when(ch == 0)
        def _init():
            alo_ref[...] = jnp.zeros((bt, npad), _U32)
            if nl == 2:
                ahi_ref[...] = jnp.zeros((bt, npad), _U32)

        def body(i_loc, carry):
            for j in range(t):
                dcol = dig_ref[0, 0, i_loc, j]           # [BT, 1] i32
                rl = jnp.zeros((bt, npad), _U32)
                rh = jnp.zeros((bt, npad), _U32) if nl == 2 else None
                for v in range(base_m1):
                    sel = dcol == jnp.int32(v + 1)
                    tl = jnp.broadcast_to(tlo_ref[0, i_loc, j, v:v + 1, :],
                                          (bt, npad))
                    rl = jnp.where(sel, tl, rl)
                    if nl == 2:
                        th = jnp.broadcast_to(
                            thi_ref[0, i_loc, j, v:v + 1, :], (bt, npad))
                        rh = jnp.where(sel, th, rh)
                alo = alo_ref[...]
                s = alo + rl
                alo_ref[...] = s
                if nl == 2:
                    cy = (s < alo).astype(_U32)
                    ahi_ref[...] = ahi_ref[...] + rh + cy
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(chunk_i), body,
                          jnp.int32(0))

        @pl.when(ch == n_chunks - 1)
        def _emit():
            out_ref[0, 0] = alo_ref[...]
            if nl == 2:
                out_ref[0, 1] = ahi_ref[...]

    return kernel


def tlwe_keyswitch_sum(dig, t_planes, bt: int = DEFAULT_BT,
                       chunk_i: int = 16, interpret: bool = False):
    """Sum of selected KS-table rows.

    dig: [B, n_in, t] int32 digits in [0, base)
    t_planes: tuple of nl u32 arrays [n_in, t, base-1, npad] (lo[, hi]),
    npad a multiple of 128.
    Returns [B, npad] torus (the subtrahend; caller computes (0,b) - out).
    B must be a multiple of bt; n_in a multiple of chunk_i."""
    from ..torus import TORUS_DTYPE
    B, n_in, t = dig.shape
    base_m1, npad = t_planes[0].shape[2], t_planes[0].shape[3]
    nl = len(t_planes)
    nb = B // bt
    n_chunks = n_in // chunk_i
    # digits tiled: [nb, n_chunks, chunk, t, BT, 1]
    dg = dig.reshape(nb, bt, n_chunks, chunk_i, t) \
            .transpose(0, 2, 3, 4, 1)[..., None]
    tp = tuple(p.reshape(n_chunks, chunk_i, t, base_m1, npad)
               for p in t_planes)
    kernel = _make_tlwe_ks_kernel(chunk_i, t, base_m1, npad, bt, nl,
                                  n_chunks)
    t_spec = pl.BlockSpec(
        (1, chunk_i, t, base_m1, npad),
        lambda b, c: (c, b * 0, b * 0, b * 0, b * 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, bt, npad), _U32),
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk_i, t, bt, 1),
                         lambda b, c: (b, c, b * 0, b * 0, b * 0, b * 0),
                         memory_space=pltpu.VMEM),
        ] + [t_spec] * nl,
        out_specs=pl.BlockSpec(
            (1, nl, bt, npad),
            lambda b, c: (b, c * 0, c * 0, c * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, npad), _U32)] * nl,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dg, *tp)
    # [nb, nl, BT, npad] -> [B, npad] torus
    if nl == 1:
        return out[:, 0].reshape(B, npad).astype(TORUS_DTYPE)
    lo = out[:, 0].reshape(B, npad).astype(jnp.uint64)
    hi = out[:, 1].reshape(B, npad).astype(jnp.uint64)
    return lo | (hi << jnp.uint64(32))


# ---------------------------------------------------------------------------
# Automorphism keyswitch kernel (GA bootstrap, `bootstrap_ga.c:39-60`)
#
#   out = (0, b) - sum_{i<k, j<t} dec_j(a_i) (x) AK[gen][i*t+j]
#
# The keyset entry AK[gen] is selected per batch row by that row's
# data-dependent generator (gathered in XLA), so the key rides the batch
# tile (per-row) and the multiply is Barrett.  Same decompose->NTT->
# mul-acc->CRT pipeline as the external product, but only the k mask
# components are decomposed and the result is *subtracted* from (0, b).
# ---------------------------------------------------------------------------

def _make_auto_ks_kernel(kp: PBSKernelPlan):
    # kp is built with l = ks_t and Bg_bit = ks_base_bit; C = k+1
    N, P, C = kp.N, kp.P, kp.C
    t = kp.l
    k_in = C - 1
    Jk = k_in * t
    bt, nl = kp.bt, kp.nl

    def kernel(perm_ref, keyv_ref, ftw_ref, ftws_ref, itw_ref, itws_ref,
               *rest):
        # perm_ref/out_ref: [1, nl, C, BT, N]; keyv_ref: [1, Jk, C, P, BT, N]
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref, dig_ref, spec_ref = rest[6:]
        else:
            out_ref, dig_ref, spec_ref = rest
            mxu_refs = None
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        for c in range(k_in):
            alo = perm_ref[0, 0, c]
            if nl == 1:
                lo = alo + _U32(kp.off_lo)
                for i in range(t):
                    dig_ref[c * t + i] = _decompose_digit(
                        lo, None, i, kp.Bg_bit, tb=32)
                continue
            ahi = perm_ref[0, 1, c]
            lo = alo + _U32(kp.off_lo)
            carry = (lo < _U32(kp.off_lo)).astype(_U32)
            hi = ahi + _U32(kp.off_hi) + carry
            for i in range(t):
                dig_ref[c * t + i] = _decompose_digit(lo, hi, i, kp.Bg_bit)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                           liota, mxu_refs, Jk,
                           lambda j, c, p_i: keyv_ref[0, j, c, p_i],
                           barrett=True)

        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        for c in range(C):
            ts = ts_all[c]
            if nl == 1:
                dlo = _garner_limb32(ts, kp)
                base = perm_ref[0, 0, c] if c == k_in else _U32(0)
                out_ref[0, 0, c] = base - dlo
                continue
            dlo, dhi = _garner_limbs(ts, kp)
            if c == k_in:
                blo = perm_ref[0, 0, c]
                bhi = perm_ref[0, 1, c]
            else:
                blo = jnp.zeros((bt, N), _U32)
                bhi = jnp.zeros((bt, N), _U32)
            olo = blo - dlo
            borrow = (blo < dlo).astype(_U32)
            out_ref[0, 0, c] = olo
            out_ref[0, 1, c] = bhi - dhi - borrow

    return kernel


def auto_keyswitch(perm, key_rows, kp: PBSKernelPlan,
                   interpret: bool = False):
    """Automorphism keyswitch with per-row gathered keys.

    perm: [B, C, N] torus (the permuted accumulator; B multiple of tile)
    key_rows: [B, Jk, C, P, N] u32 exact residues (AK entry per batch row)
    Returns [B, C, N] torus: (0, b) - sum dec(a) (x) key."""
    B, C, N = perm.shape
    t = kp.l
    Jk = (C - 1) * t
    P, bt, nl = kp.P, kp.bt, kp.nl
    S = N.bit_length() - 1
    nb = B // bt
    tiles = split_limbs(perm, kp)
    keyt = key_rows.reshape(nb, bt, Jk, C, P, N) \
                   .transpose(0, 2, 3, 4, 1, 5)      # [nb, Jk, C, P, BT, N]
    kernel = _make_auto_ks_kernel(kp)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Jk, C, P, bt, N),
                     lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), lambda i: (i * 0, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [tiles, keyt, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs(kp)
        args += _mxu_args(kp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N),
                               lambda i: (i, i * 0, i * 0, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Jk, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


def _make_auto_ks_stream_kernel(kp: PBSKernelPlan, fuse_perm: bool = False):
    """Auto-keyswitch with the per-row AK entries DMA-streamed HBM->VMEM
    inside the kernel (scalar-prefetched indices) instead of an XLA
    gather: the gather materializes [B, Jk, C, P, N] in HBM (plus a tile
    transpose) every step — the dominant residual of the GA bootstrap
    (`blind_rotate_ga`); here each grid step copies its bt rows' entries
    straight into VMEM, overlapped with the (key-independent) decompose
    and forward NTTs.

    Layout contract (probe_dma.py, measured on v5e): Mosaic rejects DMA
    slices of extent < tile along a TILED (last-two) memref dim — both a
    [.., P=3, N] src entry (P vs sublane tile 4) and a dst sliced at
    sublane r (extent 1 vs tile 8).  The working form is the unit-minor
    layout: src [G, Jk*C*P, 1, N], dst scratch [Jk*C*P, bt, 1, N] — the
    last-two dims (1, N) make every sliced dim untiled; the consumer
    reads [bt, N] rows from the (1, 128)-tiled scratch (probe B_read)."""
    N, P, C = kp.N, kp.P, kp.C
    t = kp.l
    k_in = C - 1
    Jk = k_in * t
    bt, nl = kp.bt, kp.nl

    def kernel(kidx_ref, *refs):
        # kidx_ref: [B] i32 (scalar prefetch); ak_ref: [G, Jk*C*P, 1, N]
        # u32 in HBM (ANY); key_scr: [Jk*C*P, bt, 1, N] VMEM;
        # sems: [bt] DMA semaphores.  With fuse_perm: ginv_ref [1, bt, 1]
        # i32 follows perm_ref and the Galois permutation happens HERE
        # (one dynamic lane gather per limb) instead of as XLA gather
        # stages between kernels.
        perm_ref = refs[0]
        off = 1
        ginv_ref = None
        if fuse_perm:
            ginv_ref = refs[1]
            off = 2
        ftw_ref, ftws_ref, itw_ref, itws_ref = refs[off + 1:off + 5]
        ak_ref = refs[off]
        rest = refs[off + 5:]
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            out_ref, dig_ref, spec_ref, key_scr, sems = rest[6:]
        else:
            out_ref, dig_ref, spec_ref, key_scr, sems = rest
            mxu_refs = None
        i = pl.program_id(0)
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)

        copies = []
        for r in range(bt):
            idx = kidx_ref[i * bt + r]
            # jnp.int32(r): a python-int index would be i64 under x64
            # mode and fail Mosaic's memref_slice verification
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], key_scr.at[:, jnp.int32(r)],
                sems.at[jnp.int32(r)])
            cp.start()
            copies.append(cp)

        def load_perm(c):
            """Limbs of component c of the (permuted) input — permutation
            applied in-kernel when fused, overlapped with the key DMAs."""
            alo = perm_ref[0, 0, c]
            ahi = perm_ref[0, 1, c] if nl == 2 else None
            if fuse_perm:
                return _galois_permute_limbs(alo, ahi, ginv_ref[0], N)
            return alo, ahi

        # decompose + zero spec while the key DMAs fly
        for c in range(k_in):
            alo, ahi = load_perm(c)
            if nl == 1:
                lo = alo + _U32(kp.off_lo)
                for di in range(t):
                    dig_ref[c * t + di] = _decompose_digit(
                        lo, None, di, kp.Bg_bit, tb=32)
                continue
            lo = alo + _U32(kp.off_lo)
            carry = (lo < _U32(kp.off_lo)).astype(_U32)
            hi = ahi + _U32(kp.off_hi) + carry
            for di in range(t):
                dig_ref[c * t + di] = _decompose_digit(lo, hi, di, kp.Bg_bit)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        for cp in copies:
            cp.wait()

        _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                           liota, mxu_refs, Jk,
                           lambda j, c, p_i: key_scr[
                               (j * C + c) * P + p_i, :, 0],
                           barrett=True)

        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        for c in range(C):
            ts = ts_all[c]
            if nl == 1:
                dlo = _garner_limb32(ts, kp)
                base = load_perm(c)[0] if c == k_in else _U32(0)
                out_ref[0, 0, c] = base - dlo
                continue
            dlo, dhi = _garner_limbs(ts, kp)
            if c == k_in:
                blo, bhi = load_perm(c)
            else:
                blo = jnp.zeros((bt, N), _U32)
                bhi = jnp.zeros((bt, N), _U32)
            olo = blo - dlo
            borrow = (blo < dlo).astype(_U32)
            out_ref[0, 0, c] = olo
            out_ref[0, 1, c] = bhi - dhi - borrow

    return kernel


def auto_keyswitch_stream(perm, ak32, kidx, kp: PBSKernelPlan,
                          interpret: bool = False, ginv=None):
    """Automorphism keyswitch, keyset resident in HBM and the selected
    entries DMA-streamed per batch row (see `_make_auto_ks_stream_kernel`).

    perm: [B, C, N] torus; ak32: [G, Jk, C, P, N] u32 exact residues
    (the FULL keyset — reshaped here to the unit-minor DMA layout
    [G, Jk*C*P, 1, N], a free reshape of the same HBM bytes); kidx: [B]
    i32 entry index per row.
    ginv: optional [B] i32 per-row generator inverses mod 2N — when given,
    `perm` is the UN-permuted accumulator and the Galois permutation runs
    inside the kernel (one dynamic lane gather per limb), eliminating the
    XLA permute stages between the external product and this kernel.
    Returns [B, C, N] torus: (0, b) - sum dec(a) (x) key."""
    B, C, N = perm.shape
    t = kp.l
    Jk = (C - 1) * t
    P, bt, nl = kp.P, kp.bt, kp.nl
    S = N.bit_length() - 1
    nb = B // bt
    tiles = split_limbs(perm, kp)
    if ak32.ndim != 4:
        # caller should pre-flatten outside any scan: the 5-D HBM form
        # pads P to the sublane tile, so this reshape is a physical copy
        ak32 = ak32.reshape(ak32.shape[0], Jk * C * P, 1, N)
    kernel = _make_auto_ks_stream_kernel(kp, fuse_perm=ginv is not None)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda i, k_ref: (i, i * 0, i * 0, i * 0, i * 0)),
    ]
    args = [kidx.astype(jnp.int32), tiles]
    if ginv is not None:
        in_specs.append(pl.BlockSpec(
            (1, bt, 1), lambda i, k_ref: (i, i * 0, i * 0)))
        args.append(ginv.astype(jnp.int32).reshape(nb, bt, 1))
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((P, S, N),
                     lambda i, k_ref: (i * 0, i * 0, i * 0)),
        pl.BlockSpec((P, S, N),
                     lambda i, k_ref: (i * 0, i * 0, i * 0)),
        pl.BlockSpec((P, S + 1, N),
                     lambda i, k_ref: (i * 0, i * 0, i * 0)),
        pl.BlockSpec((P, S + 1, N),
                     lambda i, k_ref: (i * 0, i * 0, i * 0)),
    ]
    args += [ak32, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        row = pl.BlockSpec((P, N), lambda i, k_ref: (i * 0, i * 0))
        mat = pl.BlockSpec((P, 512, 512),
                           lambda i, k_ref: (i * 0, i * 0, i * 0))
        in_specs += [row, row, mat, row, row, mat]
        args += _mxu_args(kp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nl, C, bt, N),
            lambda i, k_ref: (i, i * 0, i * 0, i * 0, i * 0)),
        scratch_shapes=[
            pltpu.VMEM((Jk, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
            pltpu.VMEM((Jk * C * P, bt, 1, N), _U32),
            pltpu.SemaphoreType.DMA((bt,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


def _make_ga_scan_kernel(kp: PBSKernelPlan, kp_ks: PBSKernelPlan):
    """Whole-scan GA blind rotate: ONE kernel per (batch-tile, step) doing
    external product (kp) + in-kernel Galois permute + DMA-streamed
    automorphism keyswitch (kp_ks) — the two per-step pallas_calls of
    `blind_rotate_ga` (cmux_delta, auto_keyswitch_stream) fused, with the
    accumulator VMEM-resident across the whole scan (revisited output
    block) and the step's TRGSW key rows pipelined by the grid
    (`bootstrap_ga.c:39-60`)."""
    N, P, C, J, l, Bg_bit = kp.N, kp.P, kp.C, kp.J, kp.l, kp.Bg_bit
    bt = kp.bt
    t_ks = kp_ks.l
    k_in = C - 1
    Jk = k_in * t_ks
    Pks = kp_ks.P

    def kernel(acc_ref, kidx_ref, ginv_ref, sv_ref, svs_ref, ak_ref,
               ftw_ref, ftws_ref, itw_ref, itws_ref,
               kftw_ref, kftws_ref, kitw_ref, kitws_ref, *rest):
        rest = list(rest)
        if kp.use_mxu:
            mxu_refs = tuple(rest[:6])
            rest = rest[6:]
        else:
            mxu_refs = None
        if kp_ks.use_mxu:
            mxu_ks_refs = tuple(rest[:6])
            rest = rest[6:]
        else:
            mxu_ks_refs = None
        out_ref, dig_ref, spec_ref, key_scr, sems = rest
        i = pl.program_id(1)
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)

        @pl.when(i == 0)
        def _seed():
            out_ref[...] = acc_ref[...]

        # start the automorphism-key row DMAs for THIS step's generators
        # immediately: they overlap the entire external product below
        copies = []
        for r in range(bt):
            idx = kidx_ref[0, 0, 0, r]
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], key_scr.at[:, jnp.int32(r)],
                sems.at[jnp.int32(r)])
            cp.start()
            copies.append(cp)

        # ---- external product t = BK_i (x) acc (plan kp) ---------------
        for c in range(C):
            lo = out_ref[0, 0, c] + _U32(kp.off_lo)
            carry = (lo < _U32(kp.off_lo)).astype(_U32)
            hi = out_ref[0, 1, c] + _U32(kp.off_hi) + carry
            for di in range(l):
                dig_ref[c * l + di] = _decompose_digit(lo, hi, di, Bg_bit)
        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)
        _ntt_mul_acc(kp, dig_ref, sv_ref, svs_ref, spec_ref,
                     ftw_ref, ftws_ref, liota, mxu_refs)
        ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                           mxu_refs)
        t_limbs = [
            _garner_limbs(ts_all[c], kp) for c in range(C)]

        # ---- Galois permute psi_gen(t) (in-kernel factorized gather) ---
        ginv_col = ginv_ref[0, 0]                       # [BT, 1] i32
        perm = [_galois_permute_limbs(t_limbs[c][0], t_limbs[c][1],
                                      ginv_col, N) for c in range(C)]

        # ---- automorphism keyswitch (plan kp_ks, streamed key rows) ----
        for c in range(k_in):
            plo, phi = perm[c]
            lo = plo + _U32(kp_ks.off_lo)
            carry = (lo < _U32(kp_ks.off_lo)).astype(_U32)
            hi = phi + _U32(kp_ks.off_hi) + carry
            for di in range(t_ks):
                dig_ref[c * t_ks + di] = _decompose_digit(
                    lo, hi, di, kp_ks.Bg_bit)
        for c in range(C):
            for p in range(Pks):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)
        for cp in copies:
            cp.wait()
        _ntt_mul_acc_keyfn(kp_ks, dig_ref, spec_ref, kftw_ref, kftws_ref,
                           liota, mxu_ks_refs, Jk,
                           lambda j, c, p_i: key_scr[
                               (j * C + c) * Pks + p_i, :, 0],
                           barrett=True)
        ks_all = _inv_ntts(kp_ks, spec_ref, kitw_ref, kitws_ref, liota,
                           mxu_ks_refs)
        for c in range(C):
            dlo, dhi = _garner_limbs(ks_all[c], kp_ks)
            if c == k_in:
                blo, bhi = perm[c]
            else:
                blo = jnp.zeros((bt, N), _U32)
                bhi = jnp.zeros((bt, N), _U32)
            olo = blo - dlo
            borrow = (blo < dlo).astype(_U32)
            out_ref[0, 0, c] = olo
            out_ref[0, 1, c] = bhi - dhi - borrow

    return kernel


def ga_scan_fused(acc0, gens, sv32, svs32, ak32f, inv2n,
                  kp: PBSKernelPlan, kp_ks: PBSKernelPlan,
                  interpret: bool = False):
    """The whole GA rotation scan in one pallas_call.

    acc0: [B, C, N] u64 (post-initial-keyswitch accumulator; B a multiple
    of the tile); gens: [n, B] i32 odd generators per step (the last
    entry is a_{n-1}); sv32/svs32: [n, J, C, P, N] u32 TRGSW keys;
    ak32f: [G, Jk*C*Pks, 1, N] u32 automorphism keyset (unit-minor DMA
    layout); inv2n: [N] i32.  Returns [B, C, N] u64."""
    B, C, N = acc0.shape
    bt, nl = kp.bt, kp.nl
    assert nl == 2, "ga_scan_fused implements the 64-bit torus only"
    n = gens.shape[0]
    nb = B // bt
    J, P = kp.J, kp.P
    t_ks = kp_ks.l
    Jk = (C - 1) * t_ks
    Pks = kp_ks.P
    S = N.bit_length() - 1
    tiles = split_limbs(acc0, kp)
    kidx = ((gens - 1) >> 1).astype(jnp.int32)
    ginv = jnp.take(inv2n, kidx, axis=-1) if inv2n.ndim == 1 else inv2n
    # per-(step, tile) layouts
    kidx_t = kidx.reshape(n, nb, 1, bt)
    ginv_t = ginv.reshape(n, nb, bt, 1)
    kernel = _make_ga_scan_kernel(kp, kp_ks)

    z5 = lambda b, i: (b, i * 0, i * 0, i * 0, i * 0)
    c3 = lambda b, i: (b * 0, i * 0, i * 0)
    key5 = lambda b, i: (i, b * 0, b * 0, b * 0, b * 0)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N), z5, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bt), lambda b, i: (i, b, i * 0, i * 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, bt, 1), lambda b, i: (i, b, i * 0, i * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, J, C, P, N), key5, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, J, C, P, N), key5, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((P, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Pks, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Pks, S, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Pks, S + 1, N), c3, memory_space=pltpu.VMEM),
        pl.BlockSpec((Pks, S + 1, N), c3, memory_space=pltpu.VMEM),
    ]
    args = [tiles, kidx_t, ginv_t, sv32, svs32, ak32f,
            kp.ftw, kp.ftws, kp.itw, kp.itws,
            kp_ks.ftw, kp_ks.ftws, kp_ks.itw, kp_ks.itws]

    def mxu_specs2(kpx):
        row = pl.BlockSpec((kpx.P, N), lambda b, i: (b * 0, i * 0),
                           memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((kpx.P, 512, 512),
                           lambda b, i: (b * 0, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
        return [row, row, mat, row, row, mat]

    if kp.use_mxu:
        in_specs += mxu_specs2(kp)
        args += _mxu_args(kp)
    if kp_ks.use_mxu:
        in_specs += mxu_specs2(kp_ks)
        args += [kp_ks.mxu_tw, kp_ks.mxu_tws, kp_ks.mxu_w,
                 kp_ks.mxu_itwr, kp_ks.mxu_itwrs, kp_ks.mxu_iw]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nl, C, bt, N), z5,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((max(J, Jk), bt, N), jnp.int32),
            pltpu.VMEM((C, max(P, Pks), bt, N), _U32),
            pltpu.VMEM((Jk * C * Pks, bt, 1, N), _U32),
            pltpu.SemaphoreType.DMA((bt,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


# ---------------------------------------------------------------------------
# Phase-1 kernel: rotate + combine the unfolded key products, fused NTT
#
#   SA_g = sum_m  SU[g, m] * X^{rot[g, m]}          (`bootstrap.c:151-175`)
#
# Groups ride the sublane axis (each group rotates by its own exponent — the
# same per-row rotation machinery as the blind-rotate step); the 2^u mask
# combinations are the innermost grid dimension, accumulated in a u32-limb
# scratch that wraps mod 2^TB exactly; the final combination is reduced to
# centered residues and forward-NTT'd in the same kernel invocation.
# ---------------------------------------------------------------------------

def _make_phase1_kernel(kp: PBSKernelPlan, M: int):
    N, P, C, J = kp.N, kp.P, kp.C, kp.J
    bt, nl = kp.bt, kp.nl
    JC = J * C

    def kernel(*refs):
        # su plane tiles [1, 1, JC, GT, N] u32 (lo[, hi]), rot [1,1,1,GT,1],
        # tables, out [1, 1, J, C, P, GT, N], comb scratch [JC, nl, GT, N]
        su_lo_ref = refs[0]
        i = 1
        su_hi_ref = None
        if nl == 2:
            su_hi_ref = refs[i]
            i += 1
        rot_ref, ftw_ref, ftws_ref = refs[i:i + 3]
        i += 3
        mxu_refs = None
        if kp.use_mxu:
            mxu_refs = tuple(refs[i:i + 6])
            i += 6
        out_ref, comb_ref = refs[i:i + 2]
        m = pl.program_id(2)
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        rot_col = rot_ref[0, 0, 0]                        # [GT, 1] i32

        @pl.when(m == 0)
        def _init():
            for jc in range(JC):
                for li in range(nl):
                    comb_ref[jc, li] = jnp.zeros((bt, N), _U32)

        for jc in range(JC):
            if nl == 1:
                lo = su_lo_ref[0, 0, jc]
                rlo = _negacyclic_rotate_limb32(lo, rot_col, liota, N)
                comb_ref[jc, 0] = comb_ref[jc, 0] + rlo
                continue
            lo = su_lo_ref[0, 0, jc]
            hi = su_hi_ref[0, 0, jc]
            rlo, rhi = _negacyclic_rotate_limbs(lo, hi, rot_col, liota, N)
            clo = comb_ref[jc, 0]
            slo = clo + rlo
            carry = (slo < clo).astype(_U32)
            comb_ref[jc, 0] = slo
            comb_ref[jc, 1] = comb_ref[jc, 1] + rhi + carry

        @pl.when(m == M - 1)
        def _finalize():
            if mxu_refs is not None:
                tw_ref, tws_ref, w_ref = mxu_refs[:3]
                for p_i in range(P):
                    p = kp.primes[p_i]
                    rows = []
                    for jc in range(JC):
                        rows.append(_limbs_to_resi(
                            comb_ref[jc, 0],
                            comb_ref[jc, 1] if nl == 2 else None,
                            kp, p_i))
                    yall = _fwd_ntt_mxu(
                        jnp.concatenate(rows, axis=0), ftw_ref[p_i],
                        ftws_ref[p_i], tw_ref[p_i:p_i + 1],
                        tws_ref[p_i:p_i + 1],
                        w_ref[p_i], p, kp.s256[p_i], kp.red1[p_i], N)
                    for r in range(J):
                        for c in range(C):
                            jc = r * C + c
                            out_ref[0, 0, r, c, p_i] = _exact(
                                yall[jc * bt:(jc + 1) * bt], p)
            else:
                for r in range(J):
                    for c in range(C):
                        jc = r * C + c
                        lo = comb_ref[jc, 0]
                        hi = comb_ref[jc, 1] if nl == 2 else None
                        for p_i in range(P):
                            p = kp.primes[p_i]
                            resi = _limbs_to_resi(lo, hi, kp, p_i)
                            out_ref[0, 0, r, c, p_i] = _exact(
                                _fwd_ntt(resi, ftw_ref[p_i], ftws_ref[p_i],
                                         liota, p, N), p)

    return kernel


def ubr_phase1_combine(su_tiles, rot_tiles, kp: PBSKernelPlan,
                       interpret: bool = False):
    """su_tiles: tuple of nl plane arrays [nG, M, JC, GT, N] u32;
    rot_tiles: [B, nG, M, GT, 1] i32
    -> [B, nG, J, C, P, GT, N] u32 exact NTT-domain residues of the
    combined TRGSWs."""
    B, nG, M = rot_tiles.shape[0], rot_tiles.shape[1], rot_tiles.shape[2]
    N, P, C, J, bt, nl = kp.N, kp.P, kp.C, kp.J, kp.bt, kp.nl
    JC = J * C
    S = N.bit_length() - 1
    kernel = _make_phase1_kernel(kp, M)
    su_spec = pl.BlockSpec(
        (1, 1, JC, bt, N),
        lambda b, g, m: (g, m, b * 0, b * 0, b * 0),
        memory_space=pltpu.VMEM)
    in_specs = [su_spec] * nl + [
        pl.BlockSpec((1, 1, 1, bt, 1),
                     lambda b, g, m: (b, g, m, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [*su_tiles, rot_tiles, kp.ftw, kp.ftws]
    if kp.use_mxu:
        in_specs += _mxu_specs3(kp)
        args += _mxu_args(kp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nG, J, C, P, bt, N), _U32),
        grid=(B, nG, M),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, J, C, P, bt, N),
            lambda b, g, m: (b, g, m * 0, m * 0, m * 0, m * 0, m * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((JC, nl, bt, N), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_phase1_v2_kernel(kp: PBSKernelPlan, Mc: int, mc: int):
    N, P, C, J = kp.N, kp.P, kp.C, kp.J
    nl = kp.nl
    JC = J * C

    def kernel(*refs):
        # su plane blocks [1, mc, JC, N] u32 (lo[, hi]); rot [1, 1, mc]
        # i32 SMEM; out [1, 1, J, C, P, 1, N] (revisited across mi);
        # comb scratch [JC, nl, N].
        su_lo_ref = refs[0]
        i = 1
        su_hi_ref = None
        if nl == 2:
            su_hi_ref = refs[i]
            i += 1
        rot_ref, ftw_ref, ftws_ref = refs[i:i + 3]
        i += 3
        mxu_refs = None
        if kp.use_mxu:
            mxu_refs = tuple(refs[i:i + 6])
            i += 6
        out_ref, comb_ref = refs[i:i + 2]
        mi = pl.program_id(2)
        liota = jax.lax.broadcasted_iota(_U32, (JC, N), 1)

        @pl.when(mi == 0)
        def _init():
            for li in range(nl):
                comb_ref[:, li] = jnp.zeros((JC, N), _U32)

        for t in range(mc):
            # all JC rows of this mask combination rotate by the SAME
            # exponent -> ONE dynamic roll (+ sign fix) instead of the
            # log2(2N)-stage per-row network of `ubr_phase1_combine`
            rot = rot_ref[0, 0, 0, 0, t]           # scalar i32 in [0, 2N]
            r = rot & jnp.int32(N - 1)
            flip = (rot & jnp.int32(N)) != jnp.int32(0)
            wrap = liota < r.astype(_U32)
            mask = jnp.logical_xor(wrap, flip)
            lo = su_lo_ref[0, t]                   # [JC, N]
            rlo = pltpu.roll(lo, r, 1)
            if nl == 1:
                rl = jnp.where(mask, _U32(0) - rlo, rlo)
                comb_ref[:, 0] = comb_ref[:, 0] + rl
                continue
            rhi = pltpu.roll(su_hi_ref[0, t], r, 1)
            nlo, nhi = _neg_u64(rlo, rhi)
            rl = jnp.where(mask, nlo, rlo)
            rh = jnp.where(mask, nhi, rhi)
            clo = comb_ref[:, 0]
            slo = clo + rl
            carry = (slo < clo).astype(_U32)
            comb_ref[:, 0] = slo
            comb_ref[:, 1] = comb_ref[:, 1] + rh + carry

        @pl.when(mi == Mc - 1)
        def _finalize():
            if mxu_refs is not None:
                tw_ref, tws_ref, w_ref = mxu_refs[:3]
                for p_i in range(P):
                    p = kp.primes[p_i]
                    resi = _limbs_to_resi(
                        comb_ref[:, 0],
                        comb_ref[:, 1] if nl == 2 else None, kp, p_i)
                    yall = _fwd_ntt_mxu(
                        resi, ftw_ref[p_i], ftws_ref[p_i],
                        tw_ref[p_i:p_i + 1], tws_ref[p_i:p_i + 1],
                        w_ref[p_i], p, kp.s256[p_i], kp.red1[p_i], N)
                    for r_ in range(J):
                        for c in range(C):
                            jc = r_ * C + c
                            out_ref[0, 0, r_, c, p_i] = _exact(
                                yall[jc:jc + 1], p)
            else:
                lo = comb_ref[:, 0]
                hi = comb_ref[:, 1] if nl == 2 else None
                for p_i in range(P):
                    p = kp.primes[p_i]
                    resi = _limbs_to_resi(lo, hi, kp, p_i)
                    y = _exact(_fwd_ntt(resi, ftw_ref[p_i], ftws_ref[p_i],
                                        liota, p, N), p)
                    for r_ in range(J):
                        for c in range(C):
                            jc = r_ * C + c
                            out_ref[0, 0, r_, c, p_i] = y[jc:jc + 1]

    return kernel


def ubr_phase1_combine_v2(su_planes, rot, kp: PBSKernelPlan,
                          interpret: bool = False):
    """Streaming UBR phase-1 combine (same math as `ubr_phase1_combine`,
    measured-different layout): grid (B, G, M/mc) with the J*C rows of
    one mask combination on the sublane axis, so the rotation is one
    dynamic-scalar `pltpu.roll` + sign fix per limb instead of the
    12-stage per-row network — the network was ~80% of phase-1 time at
    u=8 (`bootstrap.c:151-175` reference; see ROADMAP round-5 notes).

    su_planes: [nl, G, M, JC, N] u32 limb planes (the bootstrap key's
    native storage — no group-tiling copy); rot: [B, G, M] i32.
    -> [B, G, J, C, P, N] u32 exact NTT-domain residues."""
    nl, G, M, JC, N = su_planes.shape
    B = rot.shape[0]
    P, C, J = kp.P, kp.C, kp.J
    assert JC == J * C and N == kp.N
    S = N.bit_length() - 1
    # combinations per grid step: larger mc amortizes per-step overhead
    # (su block = mc * JC * N * 4 B per limb, double-buffered by the
    # pipeline — mc=32 is 8 MiB/limb at L2, well inside VMEM)
    mc = min(int(_os.environ.get("MOSFHET_UBR_MC", "8")), M)
    while M % mc:
        mc -= 1
    Mc = M // mc
    kernel = _make_phase1_v2_kernel(kp, Mc, mc)
    su_spec = pl.BlockSpec(
        (1, mc, JC, N), lambda b, g, mi: (g, mi, b * 0, b * 0),
        memory_space=pltpu.VMEM)
    # SMEM blocks must have last-two dims equal to (or 8/128-divisible
    # into) the array's — shape the rotations [B, G, Mc, 1, mc] so the
    # (1, mc) window IS the trailing extent
    in_specs = [su_spec] * nl + [
        pl.BlockSpec((1, 1, 1, 1, mc),
                     lambda b, g, mi: (b, g, mi, b * 0, b * 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((P, S, N), lambda b, g, mi: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N), lambda b, g, mi: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [su_planes[0]]
    if nl == 2:
        args.append(su_planes[1])
    args += [rot.astype(jnp.int32).reshape(B, G, Mc, 1, mc),
             kp.ftw, kp.ftws]
    if kp.use_mxu:
        in_specs += _mxu_specs3(kp)
        args += _mxu_args(kp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, G, J, C, P, 1, N), _U32),
        grid=(B, G, Mc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, J, C, P, 1, N),
            lambda b, g, mi: (b, g, mi * 0, mi * 0, mi * 0, mi * 0,
                              mi * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((JC, nl, N), _U32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[..., 0, :]                        # [B, G, J, C, P, N]


def tile_su_planes(su_planes, kp: PBSKernelPlan):
    """Limb planes [nl, G, M, JC, N] u32 -> tuple of nl group-tiled arrays
    [nG, M, JC, GT, N] (G padded to the tile with zeros — padded groups are
    sliced away after phase 1)."""
    nl, G, M, JC, N = su_planes.shape
    bt = kp.bt
    pad = (-G) % bt
    out = []
    for li in range(nl):
        pl_ = su_planes[li]
        if pad:
            pl_ = jnp.concatenate(
                [pl_, jnp.zeros((pad,) + pl_.shape[1:], pl_.dtype)], axis=0)
        nG = (G + pad) // bt
        out.append(pl_.reshape(nG, bt, M, JC, N).transpose(0, 2, 3, 1, 4))
    return tuple(out)


def tile_rot(rot, kp: PBSKernelPlan, G: int):
    """rot: [B, G, M] i32 -> [B, nG, M, GT, 1] (G padded with zeros)."""
    B, _, M = rot.shape
    bt = kp.bt
    pad = (-G) % bt
    if pad:
        rot = jnp.concatenate(
            [rot, jnp.zeros((B, pad, M), rot.dtype)], axis=1)
    nG = (G + pad) // bt
    return rot.reshape(B, nG, bt, M).transpose(0, 1, 3, 2)[..., None]


def merge_phase1_out(sa_tiles, G: int):
    """[B, nG, J, C, P, GT, N] -> [B, G, J, C, P, N] (drop group padding)."""
    B, nG, J, C, P, bt, N = sa_tiles.shape
    out = sa_tiles.transpose(0, 1, 5, 2, 3, 4, 6).reshape(
        B, nG * bt, J, C, P, N)
    return out[:, :G]


# ---------------------------------------------------------------------------
# Fused unfolded blind rotate: the whole scan in ONE pallas_call
#
#   for g in range(n/u):   acc = (sum_m SU[g,m] X^{rot[b,g,m]}) (x) acc
#
# Grid (batch_tiles, groups, 2^u): the accumulator lives in VMEM across the
# entire (groups x 2^u) subgrid of its batch tile (the out block index
# depends only on the batch tile), the per-group combination accumulates in
# scratch over the innermost 2^u grid steps, and the external product +
# replace happens at the last combination step.  Matches
# `blind_rotate_unfolded` (`/root/reference/src/bootstrap.c:124-148`)
# bit-exactly vs the jnp path.
# ---------------------------------------------------------------------------

def _make_unfolded_kernel(kp: PBSKernelPlan, M: int):
    N, P, C, J = kp.N, kp.P, kp.C, kp.J
    bt, nl = kp.bt, kp.nl
    JC = J * C

    def kernel(*refs):
        # acc_ref/out_ref: [1, nl, C, BT, N] u32 (out is the live state)
        # su planes: [1, 1, JC, N] u32 (lo[, hi]); rot: [1, 1, 1, BT, 1] i32
        # comb_ref: [JC, nl, BT, N]; keyspec_ref: [J, C, P, BT, N]
        acc_ref = refs[0]
        su_lo_ref = refs[1]
        i = 2
        su_hi_ref = None
        if nl == 2:
            su_hi_ref = refs[i]
            i += 1
        (rot_ref, ftw_ref, ftws_ref, itw_ref, itws_ref) = refs[i:i + 5]
        i += 5
        mxu_refs = None
        if kp.use_mxu:
            mxu_refs = tuple(refs[i:i + 6])
            i += 6
        (out_ref, comb_ref, keyspec_ref, dig_ref, spec_ref) = refs[i:i + 5]
        g = pl.program_id(1)
        m = pl.program_id(2)
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        rot_col = rot_ref[0, 0, 0]                        # [BT, 1] i32

        @pl.when((g == 0) & (m == 0))
        def _seed():
            for li in range(nl):
                for c in range(C):
                    out_ref[0, li, c] = acc_ref[0, li, c]

        @pl.when(m == 0)
        def _init():
            for jc in range(JC):
                for li in range(nl):
                    comb_ref[jc, li] = jnp.zeros((bt, N), _U32)

        # -- rotate this mask combination's TRGSW into the running sum ----
        for jc in range(JC):
            if nl == 1:
                lo = jnp.broadcast_to(su_lo_ref[0, 0, jc:jc + 1, :], (bt, N))
                rlo = _negacyclic_rotate_limb32(lo, rot_col, liota, N)
                comb_ref[jc, 0] = comb_ref[jc, 0] + rlo
                continue
            lo = jnp.broadcast_to(su_lo_ref[0, 0, jc:jc + 1, :], (bt, N))
            hi = jnp.broadcast_to(su_hi_ref[0, 0, jc:jc + 1, :], (bt, N))
            rlo, rhi = _negacyclic_rotate_limbs(lo, hi, rot_col, liota, N)
            clo = comb_ref[jc, 0]
            slo = clo + rlo
            carry = (slo < clo).astype(_U32)
            comb_ref[jc, 0] = slo
            comb_ref[jc, 1] = comb_ref[jc, 1] + rhi + carry

        @pl.when(m == M - 1)
        def _apply():
            # combined TRGSW -> exact NTT-domain key
            if mxu_refs is not None:
                tw_ref, tws_ref, w_ref = mxu_refs[:3]
                for p_i in range(P):
                    p = kp.primes[p_i]
                    rows = []
                    for jc in range(JC):
                        rows.append(_limbs_to_resi(
                            comb_ref[jc, 0],
                            comb_ref[jc, 1] if nl == 2 else None,
                            kp, p_i))
                    yall = _fwd_ntt_mxu(
                        jnp.concatenate(rows, axis=0), ftw_ref[p_i],
                        ftws_ref[p_i], tw_ref[p_i:p_i + 1],
                        tws_ref[p_i:p_i + 1],
                        w_ref[p_i], p, kp.s256[p_i], kp.red1[p_i], N)
                    for r in range(J):
                        for c in range(C):
                            jc = r * C + c
                            keyspec_ref[r, c, p_i] = _exact(
                                yall[jc * bt:(jc + 1) * bt], p)
            else:
                for r in range(J):
                    for c in range(C):
                        jc = r * C + c
                        lo = comb_ref[jc, 0]
                        hi = comb_ref[jc, 1] if nl == 2 else None
                        for p_i in range(P):
                            p = kp.primes[p_i]
                            resi = _limbs_to_resi(lo, hi, kp, p_i)
                            keyspec_ref[r, c, p_i] = _exact(
                                _fwd_ntt(resi, ftw_ref[p_i], ftws_ref[p_i],
                                         liota, p, N), p)
            # external product against the live accumulator (replace mode)
            acc_limbs = []
            for c in range(C):
                alo = out_ref[0, 0, c]
                ahi = out_ref[0, 1, c] if nl == 2 else None
                acc_limbs.append((alo, ahi))
            _decompose_to_digits(acc_limbs, dig_ref, kp)
            for c in range(C):
                for p in range(P):
                    spec_ref[c, p] = jnp.zeros((bt, N), _U32)

            _ntt_mul_acc_keyfn(kp, dig_ref, spec_ref, ftw_ref, ftws_ref,
                               liota, mxu_refs, J,
                               lambda j, c, p_i: keyspec_ref[j, c, p_i],
                               barrett=True)

            ts_all = _inv_ntts(kp, spec_ref, itw_ref, itws_ref, liota,
                               mxu_refs)
            for c in range(C):
                ts = ts_all[c]
                if nl == 1:
                    out_ref[0, 0, c] = _garner_limb32(ts, kp)
                    continue
                dlo, dhi = _garner_limbs(ts, kp)
                out_ref[0, 0, c] = dlo
                out_ref[0, 1, c] = dhi

    return kernel


def unfolded_rotate(acc0, rot, su_planes, kp: PBSKernelPlan,
                    interpret: bool = False):
    """The full unfolded blind rotate in one fused kernel.

    acc0: [B, C, N] torus (B a multiple of the tile; pad upstream)
    rot:  [B, G, M] i32 rotation exponents in [0, 2N)
    su_planes: [nl, G, M, J*C, N] u32 limb planes of the key products
    (bk.su reshaped) — streamed directly, no conversion copies.
    Returns [B, C, N] torus."""
    B, C, N = acc0.shape
    G, M = su_planes.shape[1], su_planes.shape[2]
    P, J, bt, nl = kp.P, kp.J, kp.bt, kp.nl
    JC = J * C
    S = N.bit_length() - 1
    nb = B // bt
    tiles = split_limbs(acc0, kp)                         # [nb, nl, C, BT, N]
    sus = tuple(su_planes[li] for li in range(nl))        # [G, M, JC, N] each
    rot_t = rot.reshape(nb, bt, G, M).transpose(0, 2, 3, 1)[..., None]
    kernel = _make_unfolded_kernel(kp, M)
    su_spec = pl.BlockSpec(
        (1, 1, JC, N), lambda b, g, m: (g, m, b * 0, b * 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, nl, C, bt, N),
                     lambda b, g, m: (b, b * 0, b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
    ] + [su_spec] * nl + [
        pl.BlockSpec((1, 1, 1, bt, 1),
                     lambda b, g, m: (b, g, m, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, S + 1, N),
                     lambda b, g, m: (b * 0, b * 0, b * 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [tiles, *sus, rot_t, kp.ftw, kp.ftws, kp.itw, kp.itws]
    if kp.use_mxu:
        in_specs += _mxu_specs3(kp)
        args += _mxu_args(kp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
        grid=(nb, G, M),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, nl, C, bt, N),
            lambda b, g, m: (b, g * 0, g * 0, g * 0, g * 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((JC, nl, bt, N), _U32),
            pltpu.VMEM((J, C, P, bt, N), _U32),
            pltpu.VMEM((J, bt, N), jnp.int32),
            pltpu.VMEM((C, P, bt, N), _U32),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return merge_limbs(out)


def cmux_delta(rot, keyv32, keyvs32, kp: PBSKernelPlan,
               interpret: bool = False):
    """The external product BK (x) rot, computed by the fused kernel.

    rot:    [B, C, N] uint64 (B a multiple of the tile size; pad upstream)
    keyv32/keyvs32: [J, C, P, N] uint32 NTT-form TRGSW key + Shoup companions
    returns [B, C, N] uint64 — exact, bit-identical to the jnp path
    (`trgsw.external_product` semantics, reference `trgsw.c:385-423`).
    """
    B, C, N = rot.shape
    bt = kp.bt
    assert kp.nl == 2, "cmux_delta implements the 64-bit torus only"
    assert B % bt == 0, f"batch {B} must be a multiple of the tile size {bt}"
    nb = B // bt
    lo = (rot & jnp.uint64(0xFFFFFFFF)).astype(_U32)
    hi = (rot >> jnp.uint64(32)).astype(_U32)
    x = jnp.stack([lo, hi])                            # [2, B, C, N]
    x = x.reshape(2, nb, bt, C, N).transpose(1, 0, 3, 2, 4)
    d = _cmux_delta_tiles(x, keyv32, keyvs32, kp, interpret=interpret)
    d = d.transpose(1, 0, 3, 2, 4).reshape(2, B, C, N)
    return d[0].astype(jnp.uint64) | (d[1].astype(jnp.uint64) << jnp.uint64(32))
