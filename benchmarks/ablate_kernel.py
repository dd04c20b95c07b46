"""Blind-rotate kernel ablation: where do the VPU cycles go?

Builds variants of the fused step kernel with individual phases disabled
(forward NTTs, mul-acc, inverse NTTs, Garner, rotation) and times the full
632-step scan for each on the real chip.  The deltas vs the full kernel
give the per-phase cost — the optimization guide for the single-chip
target.  Outputs are NOT cryptographically meaningful for the ablated
variants (the full kernel is verified elsewhere); timings only.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from mosfhet_tpu.ops import pbs_kernel as pk
from mosfhet_tpu import ntt as _ntt

_U32 = jnp.uint32


def make_ablated_step(kp, skip=()):
    N, P, C, J, l, Bg_bit = kp.N, kp.P, kp.C, kp.J, kp.l, kp.Bg_bit
    bt = kp.bt

    def kernel(acc_ref, a_ref, keyv_ref, keyvs_ref, ftw_ref, ftws_ref,
               itw_ref, itws_ref, *rest):
        if kp.use_mxu:
            tw_ref, tws_ref, w_ref, itwr_ref, itwrs_ref, iw_ref = rest[:6]
            out_ref, dig_ref, spec_ref = rest[6:]
        else:
            out_ref, dig_ref, spec_ref = rest
        liota = jax.lax.broadcasted_iota(_U32, (bt, N), 1)
        a_col = a_ref[0]
        acc = []
        for c in range(C):
            alo = acc_ref[0, 0, c]
            ahi = acc_ref[0, 1, c]
            acc.append((alo, ahi))
            if "rot" in skip:
                rlo, rhi = alo, ahi
            else:
                rlo, rhi = pk._negacyclic_rotate_limbs(alo, ahi, a_col,
                                                       liota, N)
            slo = rlo - alo
            borrow = (rlo < alo).astype(_U32)
            shi = rhi - ahi - borrow
            lo = slo + _U32(kp.off_lo)
            carry = (lo < _U32(kp.off_lo)).astype(_U32)
            hi = shi + _U32(kp.off_hi) + carry
            for i in range(l):
                dig_ref[c * l + i] = pk._decompose_digit(lo, hi, i, Bg_bit)

        for c in range(C):
            for p in range(P):
                spec_ref[c, p] = jnp.zeros((bt, N), _U32)

        if kp.use_mxu:
            # mirror `_ntt_mul_acc`'s MXU branch: one batched int8
            # contraction over all J rows per prime, then a statically
            # unrolled accumulate
            d_all = dig_ref[:J].reshape(J * bt, N)
            for p_i in range(P):
                p = kp.primes[p_i]
                r = jnp.where(d_all < 0, d_all + jnp.int32(p),
                              d_all).astype(_U32)
                if "fwd" in skip:
                    s_all = r.reshape(J, bt, N)
                else:
                    s_all = pk._fwd_ntt_mxu(
                        r, ftw_ref[p_i], ftws_ref[p_i],
                        tw_ref[p_i:p_i + 1], tws_ref[p_i:p_i + 1],
                        w_ref[p_i], p, kp.s256[p_i], kp.red1[p_i],
                        N).reshape(J, bt, N)
                for j in range(J):
                    for c in range(C):
                        if "acc" in skip:
                            spec_ref[c, p_i] = s_all[j]
                            continue
                        kv = jnp.broadcast_to(
                            keyv_ref[j, c, p_i:p_i + 1, :], (bt, N))
                        ks = jnp.broadcast_to(
                            keyvs_ref[j, c, p_i:p_i + 1, :], (bt, N))
                        prod = pk._shoup_lazy(s_all[j], kv, ks, p)
                        spec_ref[c, p_i] = pk._cond_sub(
                            spec_ref[c, p_i] + prod, 2 * p)
        else:
            def body(j, carryv):
                d = dig_ref[j]
                for p_i in range(P):
                    p = kp.primes[p_i]
                    r = jnp.where(d < 0, d + jnp.int32(p), d).astype(_U32)
                    if "fwd" in skip:
                        s_ = r
                    else:
                        s_ = pk._fwd_ntt(r, ftw_ref[p_i], ftws_ref[p_i],
                                         liota, p, N)
                    for c in range(C):
                        if "acc" in skip:
                            spec_ref[c, p_i] = s_
                            continue
                        kv = jnp.broadcast_to(
                            keyv_ref[j, c, p_i:p_i + 1, :], (bt, N))
                        ks = jnp.broadcast_to(
                            keyvs_ref[j, c, p_i:p_i + 1, :], (bt, N))
                        prod = pk._shoup_lazy(s_, kv, ks, p)
                        spec_ref[c, p_i] = pk._cond_sub(
                            spec_ref[c, p_i] + prod, 2 * p)
                return carryv

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(J), body,
                              jnp.int32(0))

        ts_all = [[None] * P for _ in range(C)]
        if "inv" in skip:
            for c in range(C):
                for p_i in range(P):
                    ts_all[c][p_i] = spec_ref[c, p_i]
        elif kp.use_mxu:
            for p_i in range(P):
                p = kp.primes[p_i]
                xs = jnp.concatenate([spec_ref[c, p_i] for c in range(C)],
                                     axis=0)
                y = pk._inv_ntt_mxu(xs, itw_ref[p_i], itws_ref[p_i],
                                    itwr_ref[p_i:p_i + 1],
                                    itwrs_ref[p_i:p_i + 1],
                                    iw_ref[p_i], p, kp.s256[p_i], N)
                for c in range(C):
                    ts_all[c][p_i] = y[c * bt:(c + 1) * bt]
        else:
            for c in range(C):
                for p_i in range(P):
                    ts_all[c][p_i] = pk._inv_ntt(
                        spec_ref[c, p_i], itw_ref[p_i], itws_ref[p_i],
                        liota, kp.primes[p_i], N)

        for c in range(C):
            ts = ts_all[c]
            if "garner" in skip:
                dlo, dhi = ts[0], ts[1 % P]
            else:
                dlo, dhi = pk._garner_limbs(ts, kp)
            alo, ahi = acc[c]
            olo = alo + dlo
            carry = (olo < alo).astype(_U32)
            out_ref[0, 0, c] = olo
            out_ref[0, 1, c] = ahi + dhi + carry

    return kernel


def run_variant(name, skip, kp, acc0, a_scan, kv, kvs, n, reps=2):
    N, P, C, J, bt, nl = kp.N, kp.P, kp.C, kp.J, kp.bt, kp.nl
    S = N.bit_length() - 1
    nb = acc0.shape[0] // bt
    kernel = make_ablated_step(kp, skip)

    mxu_specs = pk._mxu_specs(kp) if kp.use_mxu else []
    mxu_args = pk._mxu_args(kp) if kp.use_mxu else []

    def step_call(tiles, ai, v, vs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, nl, C, bt, N), _U32),
            grid=(nb,),
            in_specs=[
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
            ] + mxu_specs,
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
        )(tiles, ai, v, vs, kp.ftw, kp.ftws, kp.itw, kp.itws, *mxu_args)

    @jax.jit
    def scan(acc0, a_scan, kv, kvs):
        tiles = pk.split_limbs(acc0, kp)
        a_tiles = a_scan.reshape(a_scan.shape[0], nb, bt, 1)

        def step(carry, xs):
            v, vs, ai = xs
            return step_call(carry, ai, v, vs), None

        out, _ = jax.lax.scan(step, tiles, (kv, kvs, a_tiles))
        return pk.merge_limbs(out)

    out = scan(acc0, a_scan, kv, kvs)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = scan(acc0, a_scan, kv, kvs)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    dt = min(ts)
    print(json.dumps({"variant": name, "skip": list(skip),
                      "time_ms": round(dt * 1e3, 1)}), flush=True)
    return dt


def main():
    n, N, k, l, Bg_bit = 632, 2048, 1, 4, 9
    B = int(os.environ.get("BENCH_BATCH", "256"))
    primes = _ntt.primes_for_bound(_ntt.conv_bound(N, 1 << (Bg_bit - 1),
                                                   (k + 1) * l))
    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k)   # MOSFHET_NTT_MXU aware
    print(json.dumps({"variant": "__plan__",
                      "ntt": "mxu" if kp.use_mxu else "roll"}), flush=True)
    rng = np.random.default_rng(1)
    acc0 = jnp.asarray(rng.integers(0, 1 << 64, (B, k + 1, N),
                                    dtype=np.uint64))
    a_scan = jnp.asarray(rng.integers(0, 2 * N, (n, B), dtype=np.int32))
    kv = jnp.asarray((rng.integers(0, primes[0], (n, (k + 1) * l, k + 1,
                                                  len(primes), N),
                                   dtype=np.uint64)).astype(np.uint32))
    kvs = jnp.asarray(np.asarray(
        _ntt.make_shoup(kv.astype(jnp.uint64),
                        jnp.asarray(np.array(primes, np.uint64))[:, None])
    ).astype(np.uint32))

    t_full = run_variant("full", (), kp, acc0, a_scan, kv, kvs, n)
    for name, skip in [
        ("no_fwd", ("fwd",)),
        ("no_acc", ("acc",)),
        ("no_inv", ("inv",)),
        ("no_garner", ("garner",)),
        ("no_rot", ("rot",)),
        ("only_fwd", ("acc", "inv", "garner", "rot")),
    ]:
        run_variant(name, skip, kp, acc0, a_scan, kv, kvs, n)
    print(json.dumps({"variant": "boot_per_s_equiv",
                      "value": round(B / t_full, 1)}))


if __name__ == "__main__":
    main()
