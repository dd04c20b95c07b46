"""Blind rotation via Galois automorphisms (eprint 2022/198 Alg. 4,
all-odd variant) — `src/bootstrap_ga.c`.

The rotation exponents become automorphism generators, which are
*data-dependent* per ciphertext.  On TPU the per-step generator selects a
key-switching key by dynamic gather from the stacked all-odd keyset, and the
Galois permutation itself is a dynamic gather with a precomputed
inverse-mod-2N table (`misc.c:142-159`).

Parameter envelope (inherited from the reference's forced-all-odd variant,
`bootstrap_ga.c:37`): rounding every mask coefficient to an odd multiple of
1/2N biases the accumulated rotation by ~n/4 slots, so correct decryption
requires roughly n < 2N / torus_base (satisfied by the reference defaults:
n=632, N=2048, torus_base=4).  Outside that envelope the reference fails
the same way ("It is expected for many of the tests to fail depending on
the parameters", reference README:83).
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as _ntt
from . import trlwe as _trlwe
from . import trgsw as _trgsw
from . import keyswitch as _ks
from .bootstrap import _prec_offset
from .tlwe import TLWE, TLWEKey
from .trgsw import TRGSWKey
from .trlwe import TRLWE, from_stacked
from .torus import TORUS_DTYPE, torus2int, gadget_decompose


def inverse_mod_2n_table(N: int) -> np.ndarray:
    """inv[x >> 1] = x^-1 mod 2N for odd x (`inverse_mod_2N`,
    `misc.c:142-159` — computed, not tabulated)."""
    out = np.zeros(N, dtype=np.int32)
    for x in range(1, 2 * N, 2):
        out[x >> 1] = pow(x, -1, 2 * N)
    return out


@flax.struct.dataclass
class GABootstrapKey:
    """TRGSW(X^{s_i}) per key bit + all-odd automorphism KS keyset
    (`new_bootstrap_key_ga`, `bootstrap_ga.c:5-24`)."""
    s_v: jax.Array    # [n, (k+1)l, k+1, P, N]
    s_vs: jax.Array
    ak_v: jax.Array   # [N, k*t, k+1, P, N]  (keyset indexed by (gen-1)/2)
    ak_vs: jax.Array
    inv2n: jax.Array  # [N] int32
    n: int = flax.struct.field(pytree_node=False)
    k: int = flax.struct.field(pytree_node=False)
    N: int = flax.struct.field(pytree_node=False)
    l: int = flax.struct.field(pytree_node=False)
    Bg_bit: int = flax.struct.field(pytree_node=False)
    ks_t: int = flax.struct.field(pytree_node=False)
    ks_base_bit: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)
    ks_primes: tuple = flax.struct.field(pytree_node=False)

    def plan(self):
        return _ntt.get_plan(self.N, self.primes)

    def ks_plan(self):
        return _ntt.get_plan(self.N, self.ks_primes)


def new_key(rkey, out_key: TRGSWKey, in_key: TLWEKey) -> GABootstrapKey:
    """BK gen: TRGSW(X^{s_i}) + automorphism keyset for every odd generator,
    with the TRGSW decomposition params reused for the keyset
    (`bootstrap_ga.c:5-24` passes l/Bg_bit as t/base_bit).

    The keyset (N generators) is generated vectorized: one gather builds
    every permuted key, and the KS-key encryptions run in chunked
    `lax.map` batches — the reference's per-generator loop would be N
    separate keygens."""
    from . import bootstrap as _bs
    from .torus import TORUS_BITS
    tk = out_key.trlwe_key
    l, Bg_bit, k, N = out_key.l, out_key.Bg_bit, tk.k, tk.N
    n = in_key.n
    plan = out_key.plan()
    k1, k2 = jax.random.split(rkey)
    g = _bs._batched_monomial_encrypt(
        jnp.ones((n,), jnp.int64), in_key.s, out_key, k1)
    gd = _trgsw.to_dft(g, plan, with_shoup=True)

    # all-odd automorphism keyset, stacked by (gen-1)//2
    t, base_bit = l, Bg_bit
    ks_plan = _ks._ks_plan(N, base_bit, t, tk.k * t)
    # permutation tables for every odd generator (host-side)
    gens = np.arange(1, 2 * N, 2)
    idx = np.zeros((N, N), np.int32)      # [gen_idx, j] -> source coeff
    neg = np.zeros((N, N), bool)
    j = np.arange(N)
    for gi, gen in enumerate(gens):
        ginv = pow(int(gen), -1, 2 * N)
        ic = (j * ginv) % (2 * N)
        neg[gi] = ic >= N
        idx[gi] = np.where(neg[gi], ic - N, ic)
    s_t = tk.s.astype(TORUS_DTYPE)                       # [k, N]
    g_s = jnp.take(s_t, jnp.asarray(idx), axis=-1)       # [k, G, N]
    g_s = jnp.where(jnp.asarray(neg), TORUS_DTYPE(0) - g_s, g_s)
    g_s = jnp.moveaxis(g_s, 0, 1)                        # [G, k, N]
    shifts = (TORUS_DTYPE(1) << jnp.array(
        [TORUS_BITS - (j2 + 1) * base_bit for j2 in range(t)],
        dtype=TORUS_DTYPE))
    ms = g_s[:, :, None, :] * shifts[None, None, :, None]  # [G, k, t, N]
    ms = ms.reshape(N, tk.k * t, N)

    chunk = max(1, min(N, 64))
    n_chunks = N // chunk
    keys = jax.random.split(k2, n_chunks)
    ms_c = ms.reshape(n_chunks, chunk * tk.k * t, N)

    def one(args):
        rk, m = args
        c = _trlwe.encrypt(m, tk, rk)
        v = _ntt.to_ntt_u64(c.stacked(), ks_plan)
        return v, _ntt.make_shoup(v, ks_plan.p[:, None])

    v_c, vs_c = jax.lax.map(one, (keys, ms_c))
    shape = (N, tk.k * t, tk.k + 1, ks_plan.P, N)
    ak_v = v_c.reshape(shape)
    ak_vs = vs_c.reshape(shape)
    return GABootstrapKey(
        s_v=gd.v, s_vs=gd.vs,
        ak_v=ak_v, ak_vs=ak_vs,
        inv2n=jnp.asarray(inverse_mod_2n_table(N)),
        n=n, k=k, N=N, l=l, Bg_bit=Bg_bit, ks_t=t, ks_base_bit=base_bit,
        primes=plan.primes, ks_primes=ks_plan.primes)


import functools


@functools.lru_cache(maxsize=None)
def _ga_log_tables(N: int):
    """Discrete-log decomposition of the odd automorphism group.

    Every odd g mod 2N is uniquely (-1)^s * 3^e with e < N/2, so a
    data-dependent permutation psi_g factors into log2(N/2)+1 CONDITIONAL
    *static* permutations (per-row bits select each round) — XLA compiles
    static gathers efficiently, where the direct per-row dynamic lane
    gather of `_permute_dyn` serializes.

    Returns (dlog[N] int32 with (e<<1)|s at index (g-1)/2,
             perms: [(idx, neg)] for psi_{3^(2^i)},
             neg_perm: (idx, neg) for psi_{-1})."""
    order = N // 2
    dlog = np.zeros(N, np.int32)
    val = 1
    for e in range(order):
        dlog[(val - 1) >> 1] = e << 1
        dlog[(2 * N - val - 1) >> 1] = (e << 1) | 1
        val = (val * 3) % (2 * N)

    def mk(ginv):
        j = np.arange(N)
        ic = (j * ginv) % (2 * N)
        neg = ic >= N
        return (np.where(neg, ic - N, ic).astype(np.int32), neg)

    perms = []
    h = 3
    for _ in range(order.bit_length() - 1):
        perms.append(mk(pow(h, -1, 2 * N)))
        h = (h * h) % (2 * N)
    neg_perm = mk(2 * N - 1)                   # (-1)^-1 = -1 mod 2N
    return dlog, perms, neg_perm


def _permute_log(x, gen, N: int):
    """psi_gen via the +-3^e factorization: conditional static gathers.
    x: [..., C, N]; gen: [...] odd int32.  Same values as `_permute_dyn`."""
    dlog, perms, neg_perm = _ga_log_tables(N)
    se = jnp.take(jnp.asarray(dlog), (gen - 1) >> 1, axis=0)   # [...]
    e = se >> 1
    s = se & 1
    for i, (idx, neg) in enumerate(perms):
        bit = (((e >> i) & 1) == 1)[..., None, None]
        g = jnp.take(x, jnp.asarray(idx), axis=-1)
        g = jnp.where(jnp.asarray(neg), TORUS_DTYPE(0) - g, g)
        x = jnp.where(bit, g, x)
    idx, neg = neg_perm
    bit = (s == 1)[..., None, None]
    g = jnp.take(x, jnp.asarray(idx), axis=-1)
    g = jnp.where(jnp.asarray(neg), TORUS_DTYPE(0) - g, g)
    return jnp.where(bit, g, x)


def _permute_dyn(x, gen, inv2n, N: int):
    """Galois permute with a traced odd generator; x: [..., C, N],
    gen: [...] int32."""
    ginv = jnp.take(inv2n, (gen - 1) >> 1, axis=0)        # [...]
    j = jnp.arange(N, dtype=jnp.int32)
    ic = (j * ginv[..., None, None]) & (2 * N - 1)        # [..., 1, N]
    neg = (ic & N) != 0
    idx = ic & (N - 1)
    shape = jnp.broadcast_shapes(x.shape, idx.shape)
    g = jnp.take_along_axis(jnp.broadcast_to(x, shape),
                            jnp.broadcast_to(idx, shape), axis=-1)
    return jnp.where(jnp.broadcast_to(neg, shape), TORUS_DTYPE(0) - g, g)


def _eval_auto_dyn(acc_st, gen, bk: GABootstrapKey):
    """Permute by a traced generator + keyswitch with the gathered keyset
    entry (`trlwe_eval_automorphism` with dynamic key)."""
    N, k = bk.N, bk.k
    plan = bk.ks_plan()
    perm = _permute_dyn(acc_st, gen, bk.inv2n, N)
    kidx = (gen - 1) >> 1
    kv = jnp.take(bk.ak_v, kidx, axis=0)      # [..., k*t, k+1, P, N]
    kvs = jnp.take(bk.ak_vs, kidx, axis=0)
    a = perm[..., :k, :]
    b = perm[..., k, :]
    digits = _ks._decompose_digits(a, bk.ks_base_bit, bk.ks_t)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], kv, kvs, plan, axis=-4)
    as_ = _ntt.from_ntt_u64(acc, plan)        # [..., k+1, N]
    out = jnp.zeros_like(perm).at[..., k, :].set(b)
    return out - as_


def blind_rotate_ga(tv: TRLWE, a, bk: GABootstrapKey,
                    impl: str = "auto") -> TRLWE:
    """(`blind_rotate_ga`, `bootstrap_ga.c:39-60`), batched.

    acc = psi_{w_0}(tv);  per step: acc = psi_{a_i * w_{i+1}}(BK_i (x) acc);
    final: tv = psi_{a_{n-1}}(BK_{n-1} (x) acc).

    On TPU the per-step external product runs as the fused Pallas kernel
    (`ops/pbs_kernel.cmux_delta` on the accumulator itself — the same
    decompose->NTT->mul-acc->CRT program, without the rotation stage); the
    data-dependent automorphism keyswitch stays in XLA.
    """
    from . import bootstrap as _bs
    from .torus import TORUS_BITS
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    log_N2 = int(math.log2(2 * N))
    mod_mask = 2 * N - 1
    a_int = (torus2int(jnp.asarray(a, TORUS_DTYPE), log_N2)
             .astype(jnp.int32) | 1)                       # [..., n] odd
    w = jnp.take(bk.inv2n, (a_int - 1) >> 1, axis=0)       # inverses

    if impl == "auto":
        from .ops.pbs_kernel import kernel_eligible
        impl = ("pallas" if TORUS_BITS == 64 and kernel_eligible(N, bk.primes)
                else "jnp")

    batch = a_int.shape[:-1]

    if impl in ("pallas", "pallas_interpret"):
        from .ops import pbs_kernel as _pk
        interp = impl == "pallas_interpret"
        kp = _pk.get_kernel_plan(N, bk.primes, l, Bg_bit, k)
        kp_ks = _pk.get_kernel_plan(N, bk.ks_primes, bk.ks_t,
                                    bk.ks_base_bit, k)
        B = 1
        for d in batch:
            B *= d
        pad = (-B) % kp.bt
        sv32 = bk.s_v.astype(jnp.uint32)
        svs32 = bk.s_vs.astype(jnp.uint32)
        # keyset residues as u32 (loop-invariant: hoisted out of the scan);
        # Shoup companions are not gathered — the kernel multiplies with
        # Barrett, halving the per-step key-gather traffic
        ak32 = bk.ak_v.astype(jnp.uint32)
        Jk = bk.k * bk.ks_t
        # unit-minor DMA layout for the stream kernel (probe_dma.py) —
        # flattened HERE, outside the scan, because the 5-D HBM form pads
        # P to the sublane tile and the reshape is a physical copy
        ak32f = ak32.reshape(ak32.shape[0], -1, 1, N)

        def _pad_rows(x):
            if pad:
                return jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            return x

        def ext_prod(acc_st, gv, gvs):
            x = jnp.broadcast_to(acc_st, batch + (k + 1, N)
                                 ).reshape(B, k + 1, N)
            r = _pk.cmux_delta(_pad_rows(x), gv, gvs, kp,
                               interpret=interp)
            return (r[:B] if pad else r).reshape(batch + (k + 1, N))

        import os
        stream = os.environ.get("MOSFHET_GA_STREAM", "1") == "1"
        fused = stream and os.environ.get("MOSFHET_GA_FUSED", "1") == "1"
        # DEFAULT since round 5: measured 3.815 ms/op @ L2 batch 256
        # decrypt-OK vs 4.105 for the two-kernel form
        onekernel = os.environ.get("MOSFHET_GA_ONEKERNEL", "1") == "1"

        if onekernel:
            # whole scan as ONE pallas_call: per step, external product +
            # in-kernel permute + DMA-streamed automorphism keyswitch
            # fused, accumulator VMEM-resident (`ops/pbs_kernel.
            # ga_scan_fused`).  The initial psi_{w_0} keyswitch stays on
            # the standalone stream kernel.  Padded batch rows carry
            # generator 1 (identity, keyset entry 0) so the in-kernel DMA
            # indices stay in bounds.
            def pad1(x):       # pad last axis with ones (valid odd gen)
                if pad:
                    return jnp.concatenate(
                        [x, jnp.ones(x.shape[:-1] + (pad,), x.dtype)],
                        axis=-1)
                return x

            kidx0 = jnp.broadcast_to((w[..., 0] - 1) >> 1,
                                     batch).reshape(B)
            ginv0 = jnp.take(bk.inv2n, kidx0, axis=0)
            x0 = jnp.broadcast_to(tv.stacked(), batch + (k + 1, N)
                                  ).reshape(B, k + 1, N)
            pad0 = lambda v: (jnp.concatenate(
                [v, jnp.zeros((pad,), v.dtype)]) if pad else v)
            acc0 = _pk.auto_keyswitch_stream(
                _pad_rows(x0), ak32f, pad0(kidx0), kp_ks,
                interpret=interp, ginv=pad1(ginv0[None])[0])
            gens = (a_int[..., :-1] * w[..., 1:]) & mod_mask
            gens_full = jnp.concatenate(
                [gens, a_int[..., -1:]], axis=-1)      # [..., n]
            gens_scan = jnp.moveaxis(
                jnp.broadcast_to(gens_full, batch + (gens_full.shape[-1],)
                                 ).reshape(B, -1), -1, 0)  # [n, B]
            out = _pk.ga_scan_fused(
                acc0, pad1(gens_scan), sv32, svs32, ak32f, bk.inv2n,
                kp, kp_ks, interpret=interp)
            out = (out[:B] if pad else out).reshape(batch + (k + 1, N))
            return from_stacked(out)

        def auto_ks(acc_st, gen):
            """Galois permute + fused keyswitch kernel.  Default: the
            keyset stays HBM-resident with the selected per-row entries
            DMA-streamed inside the kernel (scalar-prefetched indices),
            and the permutation itself ALSO runs in-kernel as one dynamic
            lane gather per limb (`_galois_permute_limbs`) — no per-step
            XLA gather materialization of either the keys or the
            permuted accumulator.  MOSFHET_GA_FUSED=0 keeps the permute
            in XLA (`_permute_log` conditional static gathers);
            MOSFHET_GA_STREAM=0 falls back to the gather + per-row-key
            kernel."""
            kidx = jnp.broadcast_to((gen - 1) >> 1, batch).reshape(B)
            if fused:
                x = jnp.broadcast_to(acc_st, batch + (k + 1, N)
                                     ).reshape(B, k + 1, N)
                ginv = jnp.take(bk.inv2n, kidx, axis=0)
                pad_g = (jnp.concatenate(
                    [ginv, jnp.ones((pad,), ginv.dtype)]) if pad else ginv)
                kidx_p = (jnp.concatenate(
                    [kidx, jnp.zeros((pad,), kidx.dtype)]) if pad else kidx)
                out = _pk.auto_keyswitch_stream(
                    _pad_rows(x), ak32f, kidx_p, kp_ks, interpret=interp,
                    ginv=pad_g)
                return (out[:B] if pad else out).reshape(
                    batch + (k + 1, N))
            perm = _permute_log(acc_st, gen, N)
            x = jnp.broadcast_to(perm, batch + (k + 1, N)
                                 ).reshape(B, k + 1, N)
            if stream:
                kidx_p = (jnp.concatenate(
                    [kidx, jnp.zeros((pad,), kidx.dtype)]) if pad else kidx)
                out = _pk.auto_keyswitch_stream(
                    _pad_rows(x), ak32f, kidx_p, kp_ks, interpret=interp)
            else:
                kv = jnp.take(ak32, kidx, axis=0)   # [B, Jk, k+1, P, N]
                out = _pk.auto_keyswitch(_pad_rows(x), _pad_rows(kv),
                                         kp_ks, interpret=interp)
            return (out[:B] if pad else out).reshape(batch + (k + 1, N))

        acc = auto_ks(tv.stacked(), w[..., 0])
        sv_scan, svs_scan = sv32, svs32

        gens = (a_int[..., :-1] * w[..., 1:]) & mod_mask   # [..., n-1]
        gens_scan = jnp.moveaxis(gens, -1, 0)

        def step(acc_st, xs):
            gv, gvs, gen = xs
            t = ext_prod(acc_st, gv, gvs)
            return auto_ks(t, gen), None

        acc, _ = jax.lax.scan(
            step, acc, (sv_scan[:-1], svs_scan[:-1], gens_scan))
        t = ext_prod(acc, sv_scan[-1], svs_scan[-1])
        out = auto_ks(t, a_int[..., -1])
        return from_stacked(out)
    else:
        plan = bk.plan()

        def ext_prod(acc_st, gv, gvs):
            digits = gadget_decompose(acc_st, Bg_bit, l)
            digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
            spec = _ntt.to_ntt_small(digits, plan)
            r = _ntt.pointwise_mul_acc_key(
                spec[..., :, None, :, :], gv, gvs, plan, axis=-4)
            return _ntt.from_ntt_u64(r, plan)

        sv_scan, svs_scan = bk.s_v, bk.s_vs

    acc = _eval_auto_dyn(tv.stacked(), w[..., 0], bk)
    gens = (a_int[..., :-1] * w[..., 1:]) & mod_mask       # [..., n-1]
    gens_scan = jnp.moveaxis(gens, -1, 0)

    def step(acc_st, xs):
        gv, gvs, gen = xs
        t = ext_prod(acc_st, gv, gvs)
        return _eval_auto_dyn(t, gen, bk), None

    acc, _ = jax.lax.scan(
        step, acc, (sv_scan[:-1], svs_scan[:-1], gens_scan))
    t = ext_prod(acc, sv_scan[-1], svs_scan[-1])
    out = _eval_auto_dyn(t, a_int[..., -1], bk)
    return from_stacked(out)


def functional_bootstrap_ga(tv: TRLWE, c: TLWE, bk: GABootstrapKey,
                            torus_base: int) -> TLWE:
    """(`functional_bootstrap_ga`, `bootstrap_ga.c:62-76`)."""
    N = bk.N
    log_N2 = int(math.log2(2 * N))
    b_int = torus2int(c.b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
    acc = _trlwe.mul_by_xai(tv, 2 * N - b_int)
    rot = blind_rotate_ga(acc, c.a, bk)
    return _trlwe.extract_tlwe(rot, 0)
