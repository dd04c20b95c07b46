"""Benchmark suite mirroring the reference's harnesses.

Sections correspond to `test/benchmark.c` (feature gates at :84-94) and
`test/benchmark_arith.c` of the reference; TFHEpp Level-2 parameters
(`benchmark.c:63-76`).  Each section prints one JSON line; a final line
aggregates.  Reference single-core AVX-512 numbers from BASELINE.md are
embedded for the vs_baseline ratios.

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_suite.py
Env: BENCH_BATCH (default 512), BENCH_REPS (default 3), SECTIONS (csv).
"""

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

BASELINES_MS = {                       # AVX-512 + VAES, 1 vCPU (BASELINE.md)
    "pbs_unfold1": 40.9,
    "mv_phase1": 42.1,
    "mv_phase2": 0.007,
    "trgsw_bootstrap_phase1": 286.0,
    "trgsw_bootstrap_phase2": 0.043,
    "fwd_transform": 0.00266,          # per N=2048 transform
    "inv_transform": 0.00284,
    "pointwise_mul": 0.000186,
    "tlwe_keyswitch": None,            # not reported by the reference
    "tensor_prod_fft": None,
}


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts)


def report(name, per_op_ms, batch, extra=None):
    # failed rows pass per_op_ms=None: value must be null, never the
    # non-standard NaN token (strict JSON parsers reject it)
    base = BASELINES_MS.get(name)
    ok = per_op_ms is not None and per_op_ms == per_op_ms
    rec = {"metric": name,
           "value": round(per_op_ms, 6) if ok else None,
           "unit": "ms/op", "batch": batch,
           "vs_baseline": round(base / per_op_ms, 2) if (base and ok)
           else None}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from mosfhet_tpu import (params, tlwe, trlwe, trgsw, bootstrap, rng,
                             torus, keyswitch, product, ntt)

    p = params.get_params(os.environ.get("BENCH_PARAMS", "TFHEPP_L2"))
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    sections = os.environ.get(
        "SECTIONS", "pbs,mv,trgsw_bs,ntt,ks,tensor").split(",")

    key = jax.random.PRNGKey(99)
    ks = jax.random.split(key, 10)
    t0 = time.time()
    key_tlwe = tlwe.new_binary_key(ks[0], p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(ks[1], p.N, p.k, p.rlwe_sigma)
    key_ext = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = jax.jit(lambda r, kt: bootstrap.new_key(r, gk, kt, 1))(
        ks[2], key_tlwe)
    jax.block_until_ready(bk.v)
    print(f"# keygen {time.time()-t0:.0f}s", file=sys.stderr)

    luts = rng.uniform_torus(ks[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
    cs = jax.jit(tlwe.encrypt)(ms, key_tlwe, ks[4])
    results = []

    if "pbs" in sections:
        f = jax.jit(lambda tv, cs, bk: bootstrap.functional_bootstrap(
            tv, cs, bk, 4))
        dt = timed(f, tv, cs, bk, reps=reps)
        results.append(report("pbs_unfold1", dt / batch * 1e3, batch))

    if "mv" in sections:
        f1 = jax.jit(lambda cs, bk: bootstrap.multivalue_bootstrap_phase1(
            cs, bk, 4))
        dt = timed(f1, cs, bk, reps=reps)
        results.append(report("mv_phase1", dt / batch * 1e3, batch))
        rotated = f1(cs, bk)
        lut_vals = [1, 2, 3, 0]
        f2 = jax.jit(lambda rot: bootstrap.multivalue_bootstrap_phase2(
            lut_vals, rot, 4, 2))
        dt = timed(f2, rotated, reps=reps)
        results.append(report("mv_phase2", dt / batch * 1e3, batch))

    if "trgsw_bs" in sections:
        bs_batch = max(batch // 8, 32)   # TRGSW accumulators are 8x bigger
        cs_small = tlwe.TLWE(a=cs.a[:bs_batch], b=cs.b[:bs_batch])
        f1 = jax.jit(
            lambda cs, bk: bootstrap.functional_bootstrap_trgsw_phase1(
                cs, bk, 4, p.l, p.Bg_bit))
        dt = timed(f1, cs_small, bk, reps=reps)
        results.append(report("trgsw_bootstrap_phase1", dt / bs_batch * 1e3,
                              bs_batch))
        g = f1(cs_small, bk)
        tv_b = trlwe.TRLWE(
            a=jnp.broadcast_to(tv.a, (bs_batch,) + tv.a.shape),
            b=jnp.broadcast_to(tv.b, (bs_batch,) + tv.b.shape))
        f2 = jax.jit(bootstrap.functional_bootstrap_trgsw_phase2)
        dt = timed(f2, g, tv_b, reps=reps)
        results.append(report("trgsw_bootstrap_phase2", dt / bs_batch * 1e3,
                              bs_batch))

    if "ntt" in sections:
        # Iterate inside one jit (lax.scan) so per-call host<->device
        # transfer does not dominate the tiny ops being measured.
        plan = ntt.get_plan(p.N)
        nb = max(batch, 512)
        iters = 32
        x = rng.uniform_torus(ks[5], (nb, p.N))

        @jax.jit
        def roundtrip_chain(x):
            def body(x, _):
                return ntt.from_ntt_u64(ntt.to_ntt_u64(x, plan), plan), None
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out

        dt = timed(roundtrip_chain, x, reps=reps)
        per = dt / (nb * iters) / 2 * 1e3   # per single transform
        results.append(report("fwd_transform", per, nb,
                              {"note": "roundtrip/2, jnp path"}))
        results.append(report("inv_transform", per, nb,
                              {"note": "roundtrip/2, jnp path"}))

        s0 = jax.jit(lambda x: ntt.to_ntt_u64(x, plan))(x)

        @jax.jit
        def pw_chain(s, s0):
            def body(s, _):
                return ntt.pointwise_mul(s, s0, plan), None
            out, _ = jax.lax.scan(body, s, None, length=iters)
            return out

        dt = timed(pw_chain, s0, s0, reps=reps)
        results.append(report("pointwise_mul", dt / (nb * iters) * 1e3, nb))

    if "ks" in sections:
        t0 = time.time()
        kskm = jax.jit(lambda r: tlwe.new_ks_key_no_precomp(
            r, key_tlwe, key_ext, p.t, p.base_bit))(ks[6])
        pksk = jax.jit(tlwe.prepare_ks_key_mxu)(kskm)
        jax.block_until_ready(pksk.a_nib)
        print(f"# ks keygen {time.time()-t0:.0f}s "
              f"({pksk.a_nib.nbytes/2**30:.2f} GiB int8)", file=sys.stderr)
        ms_big = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
        cbig = jax.jit(tlwe.encrypt)(ms_big, key_ext, ks[7])
        f = jax.jit(tlwe.keyswitch_mxu)   # key as argument, not constant
        dt = timed(f, cbig, pksk, reps=reps)
        results.append(report("tlwe_keyswitch_mxu", dt / batch * 1e3, batch))

    if "tensor" in sections:
        rlk = keyswitch.new_rl_key(ks[8], key_trlwe, p.t, p.base_bit)
        mp = rng.uniform_torus(ks[9], (max(batch // 8, 32), p.N))
        c1 = jax.jit(trlwe.encrypt)(mp, key_trlwe, ks[5])
        c2 = jax.jit(trlwe.encrypt)(mp, key_trlwe, ks[6])
        f = jax.jit(lambda a, b: product.tensor_prod_fft(a, b, 4, rlk))
        dt = timed(f, c1, c2, reps=reps)
        results.append(report("tensor_prod_fft", dt / mp.shape[0] * 1e3,
                              mp.shape[0]))

    if "ks2" in sections:
        # the reference's BENCH_{PRIV_KS,PACK1_KS,LUT_KS,CDKS21_KS}
        # sections (`benchmark.c:142-188`); packing1/priv-SK/LUT tables
        # are multi-GiB dense at L2 — seeded keys + streamed apply
        bks = max(batch // 8, 32)
        msk = torus.double2torus((jnp.arange(bks) % 4) / 8.0)
        ck = jax.jit(tlwe.encrypt)(msk, key_ext, ks[7])
        t0 = time.time()
        kskb = keyswitch.new_packing1_ks_key_seeded(
            ks[6], key_trlwe, key_ext, p.t, p.base_bit)
        jax.block_until_ready(kskb.b)
        print(f"# packing1 seeded keygen {time.time()-t0:.0f}s",
              file=sys.stderr)
        f = jax.jit(keyswitch.packing1_keyswitch)
        dt = timed(f, ck, kskb, reps=reps)
        results.append(report("packing1_ks", dt / bks * 1e3, bks))
        del kskb

        t0 = time.time()
        kska = keyswitch.new_priv_sk_ks_key_seeded(
            ks[8], key_trlwe, key_ext, p.t, p.base_bit)
        jax.block_until_ready(kska.b)
        print(f"# priv-SK seeded keygen {time.time()-t0:.0f}s",
              file=sys.stderr)
        f = jax.jit(keyswitch.priv_keyswitch)
        dt = timed(f, ck, kska, reps=reps)
        results.append(report("priv_ks", dt / bks * 1e3, bks))
        del kska

        # run the remaining sub-benches independently: one key family
        # OOMing (LUT table at L2 sits right at the HBM edge after the
        # packing1/priv-SK transients) must not lose the later rows
        import gc

        def attempt(label, fn):
            gc.collect()   # drop freed device buffers before big keygen
            try:
                fn()
            except Exception as ex:
                print(f"# {label} failed: {type(ex).__name__}",
                      file=sys.stderr)
                results.append(report(label, None, bks,
                                      {"ok": False,
                                       "err": type(ex).__name__}))

        def lut_bench():
            t0 = time.time()
            lutk = keyswitch.new_lut_packing_ks_key_seeded(
                ks[9], key_trlwe, key_tlwe, p.t, p.base_bit, 4)
            jax.block_until_ready(lutk.b)
            print(f"# LUT-packing seeded keygen {time.time()-t0:.0f}s",
                  file=sys.stderr)
            ms4 = torus.double2torus((jnp.arange(bks * 4) % 4) / 8.0
                                     ).reshape(bks, 4)
            c4 = jax.jit(tlwe.encrypt)(ms4, key_tlwe, ks[5])
            f = jax.jit(keyswitch.lut_packing_keyswitch)
            dt = timed(f, c4, lutk, reps=reps)
            results.append(report("lut_packing_ks", dt / bks * 1e3, bks))
        attempt("lut_packing_ks", lut_bench)

        def cdks_bench():
            cdk = keyswitch.new_cdks21_packing_keys(
                ks[6], key_trlwe, key_ext, p.t, p.base_bit)
            f = jax.jit(lambda c: keyswitch.packing1_keyswitch_cdks21(
                c, cdk))
            dt = timed(f, ck, reps=reps)
            results.append(report("cdks21_ks", dt / bks * 1e3, bks))
        attempt("cdks21_ks", cdks_bench)

    if "cb" in sections:
        # BENCH_CIRCUIT_BOOTSTRAP (`benchmark.c:189-205`): v1 (l PBS), v2
        # (many-LUT), v3 (TRLWE priv-KS pair)
        bks = max(batch // 16, 16)
        msk = torus.double2torus(jnp.full((bks,), 1 / 4.0))
        ck = jax.jit(tlwe.encrypt)(msk, key_tlwe, ks[7])
        kskb = keyswitch.new_packing1_ks_key_seeded(
            ks[6], key_trlwe, key_ext, p.t, p.base_bit)
        kska = keyswitch.new_priv_sk_ks_key_seeded(
            ks[8], key_trlwe, key_ext, p.t, p.base_bit)
        for name, fn in (
            ("circuit_bootstrap", lambda c: bootstrap.circuit_bootstrap(
                c, bk, kska, kskb, p.l, p.Bg_bit)),
            ("circuit_bootstrap_2", lambda c: bootstrap.circuit_bootstrap_2(
                c, bk, kska, kskb, p.l, p.Bg_bit)),
        ):
            dt = timed(jax.jit(fn), ck, reps=reps)
            results.append(report(name, dt / bks * 1e3, bks))
        del kska
        pair = keyswitch.new_priv_ks_key_pair(ks[9], key_trlwe, key_trlwe,
                                              10, 4)
        dt = timed(jax.jit(lambda c: bootstrap.circuit_bootstrap_3(
            c, bk, pair, kskb, p.l, p.Bg_bit)), ck, reps=reps)
        results.append(report("circuit_bootstrap_3", dt / bks * 1e3, bks))
        del pair, kskb

    if "fdfb" in sections:
        # BENCH_FDFB (`benchmark.c:223-260`)
        bks = max(batch // 8, 32)
        luts8 = rng.uniform_torus(ks[5], (8,))
        tvp = jnp.repeat(luts8, (2 * p.N) // 8)
        msk = torus.int2torus(jnp.asarray(jnp.arange(bks) % 8,
                                          jnp.uint64), 3)
        ck = jax.jit(tlwe.encrypt)(msk, key_tlwe, ks[7])
        kskb = keyswitch.new_packing1_ks_key_seeded(
            ks[6], key_trlwe, key_ext, p.t, p.base_bit)
        dt = timed(jax.jit(lambda c: bootstrap.fdfb_ks21(
            tvp, c, bk, kskb, 8)), ck, reps=reps)
        results.append(report("fdfb_ks21", dt / bks * 1e3, bks))
        del kskb
        tksk = jax.jit(lambda r: tlwe.new_ks_key(
            r, key_tlwe, key_ext, p.t, p.base_bit))(ks[8])
        luts8b = rng.uniform_torus(ks[9], (8,))
        tvm = trlwe.torus_packing_many_lut(luts8b, 4, 2, p.k, p.N)
        dt = timed(jax.jit(lambda c: bootstrap.fdfb_this_work(
            tvm, c, bk, tksk, 3)), ck, reps=reps)
        results.append(report("fdfb_this_work", dt / bks * 1e3, bks))

    print(json.dumps({"metric": "suite", "sections": len(results)}))


if __name__ == "__main__":
    main()
