"""MV bootstrap phase-2 LUT composition, isolated at K = 64-1024 LUTs.

The reference composes one LUT from a cached constant-TV rotation in 7 us
single-core (`test/benchmark.c:135-137`, `bootstrap.c:245-265`).  Here the
compose is `multivalue_bootstrap_phase2_many`: ALL K LUTs in one
vectorized program against one phase-1 rotation.  Marginal-cost
methodology (round-3 fix): time (phase1 + K composes) minus (phase1 + 1
compose), divide by K-1 — phase 1 and the LUT-independent extraction
gathers are shared, exactly as the reference's amortized figure charges
only the compose.  Every output decrypt-verified.

One JSON row per K: {"metric": "mv_phase2_many_L2", "K": K,
"value": us_per_lut, "vs_baseline": 7/us, "decrypt_ok": bool}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import os
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
    p = params.TFHEPP_L2
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    kk = jax.random.split(jax.random.PRNGKey(20260820), 6)
    key_tlwe = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = jax.jit(lambda r, k_: bootstrap.new_key(r, gk, k_, 1))(
        kk[2], key_tlwe)
    jax.block_until_ready(bk.v)
    log("# keygen done")

    slots = jnp.arange(batch) % 4
    ms = torus.double2torus(slots / 8.0)
    cs = jax.jit(lambda m, r: tlwe.encrypt(m, key_tlwe, r))(ms, kk[4])

    for K in (64, 256, 1024):
        lut_tables = [[(3 * i + j) % 4 for i in range(4)]
                      for j in range(K)]

        def pipeline(tables):
            def fn(c, bk):
                rot = bootstrap.multivalue_bootstrap_phase1(c, bk, 4)
                return bootstrap.multivalue_bootstrap_phase2_many(
                    tables, rot, 4, 2)
            return jax.jit(fn)

        t_full, outs = timeit(pipeline(lut_tables), cs, bk)
        t_one, _ = timeit(pipeline(lut_tables[:1]), cs, bk)
        us = (t_full - t_one) / (K - 1) / batch * 1e6
        ph = np.asarray(tlwe.phase(outs, key_out), np.uint64)  # [K, B]
        sl = np.asarray(slots)
        want = np.asarray(torus.double2torus(jnp.asarray(
            [[lut_tables[j][s] for s in sl] for j in range(K)]) / 8.0),
            np.uint64)
        err = np.abs((ph - want).view(np.int64).astype(np.float64)).max()
        ok = bool(err <= 2.0**58)
        log(f"# K={K}: full {t_full*1e3:.1f} ms, base {t_one*1e3:.1f} ms "
            f"-> {us:.3f} us/LUT (decrypt {'OK' if ok else 'FAIL'}, "
            f"err 2^{np.log2(err+1):.1f})")
        print(json.dumps({
            "metric": "mv_phase2_many_L2", "K": K,
            "value": round(us, 3), "unit": "us/LUT",
            "vs_baseline": round(7.0 / us, 2) if us > 0 else None,
            "batch": batch, "decrypt_ok": ok}), flush=True)


if __name__ == "__main__":
    main()
