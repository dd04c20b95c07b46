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


def _local_dft(x, plan: DistNTTPlan):
    """Iterative cyclic DIF over the last axis (length N2), output
    bit-reversed.  x: [P, N2] u64 residues (< p)."""
    N2 = plan.N2
    pb = plan.p[:, None, None]
    for s, tw in enumerate(plan.loc_tw):
        h = N2 >> (s + 1)
        v = x.reshape(x.shape[:-1] + (N2 // (2 * h), 2, h))
        u, w_ = v[..., 0, :], v[..., 1, :]
        top = (u + w_) % pb
        bot = ((u + pb - w_) * tw[:, None, :]) % pb
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape)
    return x


def _local_idft(x, plan: DistNTTPlan):
    """Inverse of `_local_dft` (consumes bit-reversed), without the 1/N2
    scaling (folded into the plan's itwist)."""
    N2 = plan.N2
    pb = plan.p[:, None, None]
    for s, itw in enumerate(plan.loc_itw):
        h = 1 << s
        v = x.reshape(x.shape[:-1] + (N2 // (2 * h), 2, h))
        u, w_ = v[..., 0, :], v[..., 1, :]
        wt = (w_ * itw[:, None, :]) % pb
        top = (u + wt) % pb
        bot = (u + pb - wt) % pb
        x = jnp.stack([top, bot], axis=-2).reshape(x.shape)
    return x


def _forward_sharded(x, plan: DistNTTPlan, axis: str, twist, mid):
    """x: this shard's [P, N2] residues.  One ppermute per device stage."""
    D, logD = plan.D, plan.logD
    j = jax.lax.axis_index(axis)
    pcol = plan.p[:, None]
    x = (x * twist) % pcol
    for s in range(logD):
        h = D >> (s + 1)
        recv = jax.lax.ppermute(
            x, axis, perm=[(i, i ^ h) for i in range(D)])
        is_bot = (j & h) != 0
        tw = plan.dev_tw[s][:, j][:, None]                 # [P, 1]
        top = (x + recv) % pcol
        bot = ((recv + pcol - x) * tw) % pcol
        x = jnp.where(is_bot, bot, top)
    x = (x * mid) % pcol
    return _local_dft(x, plan)


def _inverse_sharded(x, plan: DistNTTPlan, axis: str, itwist, imid):
    D, logD = plan.D, plan.logD
    j = jax.lax.axis_index(axis)
    pcol = plan.p[:, None]
    x = _local_idft(x, plan)
    x = (x * imid) % pcol
    for s in range(logD):
        h = 1 << s
        is_bot = (j & h) != 0
        itw = plan.dev_itw[s][:, j][:, None]
        pre = jnp.where(is_bot, (x * itw) % pcol, x)
        recv = jax.lax.ppermute(
            pre, axis, perm=[(i, i ^ h) for i in range(D)])
        top = (pre + recv) % pcol
        bot = (recv + pcol - pre) % pcol
        x = jnp.where(is_bot, bot, top)
    return (x * itwist) % pcol


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
