"""Unfolded blind rotate + UBR multi-value benchmarks on real TPU.

Fills the baseline-table rows the reference measures in
`test/benchmark.c:269-309`: functional bootstrap at unfold = 2/4/8 and the
amortized UBR multi-value phase 2 per-LUT cost at u = 2/4/8, all at TFHEpp
Level-2 parameters.  Baselines (BASELINE.md, 1-core AVX-512):
  unfold-2 68.2 ms, unfold-4 80.2 ms, unfold-8 550.7 ms per bootstrap;
  UBR phase-2 u=2 14.8 ms, u=4 6.6 ms, u=8 3.4 ms per LUT.

Every measurement decrypt-verifies its outputs.  Prints one JSON line per
row (appended to benchmarks/results_r2.jsonl by the caller).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def phase_err(ph, want):
    import numpy as np
    ph = np.asarray(ph, dtype=np.uint64)
    want = np.asarray(want, dtype=np.uint64)
    return float(np.abs((ph - want).view(np.int64).astype(np.float64)).max())


def main():
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus

    p = params.TFHEPP_L2
    reps = int(os.environ.get("BENCH_REPS", "3"))
    unfolds = [int(u) for u in
               os.environ.get("BENCH_UNFOLDS", "2,4,8").split(",")]
    results = []

    key = jax.random.PRNGKey(77)
    k0, k1, k3 = jax.random.split(key, 3)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    luts = rng.uniform_torus(k3, (4,))
    tv1 = trlwe.torus_packing(luts, p.k, p.N)

    baselines_full = {2: 68.2, 4: 80.2, 8: 550.7}
    baselines_ph2 = {2: 14.8, 4: 6.6, 8: 3.4}

    for u in unfolds:
        batch = int(os.environ.get(
            "BENCH_BATCH", "64" if u == 8 else "256"))
        t0 = time.time()
        bkey = jax.random.fold_in(key, 100 + u)
        # chunked keygen: u=8 builds 20224 TRGSWs (5.3 GiB time-domain)
        bk = jax.jit(lambda rk, kt: bootstrap.new_key(rk, gk, kt, u),
                     static_argnames=())(bkey, key_tlwe)
        jax.block_until_ready(bk.su)
        log(f"# u={u}: keygen {time.time()-t0:.1f}s, su "
            f"{bk.su.nbytes/2**30:.2f} GiB")

        ms = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
        cs = jax.jit(lambda m, kk: tlwe.encrypt(m, key_tlwe, kk))(
            ms, jax.random.fold_in(key, 200 + u))

        # ---- full unfolded bootstrap --------------------------------
        fb = jax.jit(lambda tv, c, bk: bootstrap.functional_bootstrap(
            tv, c, bk, 4))
        t0 = time.time()
        out = fb(tv1, cs, bk)
        jax.block_until_ready(out.b)
        log(f"# u={u} full BS compile+run: {time.time()-t0:.1f}s")
        err = phase_err(tlwe.phase(out, key_out),
                        luts[jnp.arange(batch) % 4])
        ok = err <= 2.0**58
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = fb(tv1, cs, bk)
            jax.block_until_ready(out.b)
            times.append(time.time() - t0)
        dt = min(times) / batch
        log(f"# u={u} full BS: {dt*1e3:.2f} ms/bootstrap "
            f"(decrypt {'OK' if ok else 'FAIL'}, err 2^{err and __import__('math').log2(err+1):.1f})")
        results.append({
            "metric": f"pbs_L2_unfold{u}", "value": round(dt * 1e3, 3),
            "unit": "ms/bootstrap",
            "vs_baseline": round(baselines_full[u] / (dt * 1e3), 2),
            "batch": batch, "decrypt_ok": bool(ok),
        })

        # ---- UBR phase 1 (one ciphertext) + phase 2 (many LUTs) ------
        c1 = jax.jit(lambda m, kk: tlwe.encrypt(m, key_tlwe, kk))(
            torus.double2torus(2 / 8.0), jax.random.fold_in(key, 300 + u))
        ph1 = jax.jit(lambda c, bk: bootstrap.multivalue_bootstrap_UBR_phase1(
            c, bk))
        t0 = time.time()
        sa = ph1(c1, bk)
        jax.block_until_ready(sa.v)
        log(f"# u={u} phase1 compile+run: {time.time()-t0:.1f}s "
            f"(sa {sa.v.nbytes/2**20:.0f} MiB)")
        times = []
        for _ in range(reps):
            t0 = time.time()
            sa = ph1(c1, bk)
            jax.block_until_ready(sa.v)
            times.append(time.time() - t0)
        ph1_ms = min(times) * 1e3
        log(f"# u={u} UBR phase1: {ph1_ms:.1f} ms/ciphertext")
        results.append({
            "metric": f"ubr_phase1_L2_u{u}", "value": round(ph1_ms, 2),
            "unit": "ms/op", "vs_baseline": None, "batch": 1,
        })

        n_luts = int(os.environ.get("BENCH_LUTS", "256"))
        lut_vals = rng.uniform_torus(
            jax.random.fold_in(key, 400 + u), (n_luts, 4))
        tvs = trlwe.torus_packing(lut_vals, p.k, p.N)
        ph2 = jax.jit(
            lambda tv, c, sa, bk: bootstrap.multivalue_bootstrap_UBR_phase2(
                tv, c, sa, bk, 4))
        t0 = time.time()
        out2 = ph2(tvs, c1, sa, bk)
        jax.block_until_ready(out2.b)
        log(f"# u={u} phase2 compile+run: {time.time()-t0:.1f}s")
        err2 = phase_err(tlwe.phase(out2, key_out), lut_vals[:, 2])
        ok2 = err2 <= 2.0**58
        times = []
        for _ in range(reps):
            t0 = time.time()
            out2 = ph2(tvs, c1, sa, bk)
            jax.block_until_ready(out2.b)
            times.append(time.time() - t0)
        dt2 = min(times) / n_luts
        log(f"# u={u} UBR phase2: {dt2*1e3:.3f} ms/LUT x {n_luts} LUTs "
            f"(decrypt {'OK' if ok2 else 'FAIL'})")
        results.append({
            "metric": f"ubr_phase2_L2_u{u}", "value": round(dt2 * 1e3, 4),
            "unit": "ms/LUT",
            "vs_baseline": round(baselines_ph2[u] / (dt2 * 1e3), 2),
            "batch": n_luts, "decrypt_ok": bool(ok2),
        })
        # print rows as they complete (a later-unfolding OOM must not lose
        # the finished measurements), then free the key
        for r in results:
            print(json.dumps(r), flush=True)
        results = []
        del bk, sa
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
