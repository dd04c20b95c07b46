"""Galois-automorphism bootstrap benchmark at L2 params on real TPU.

Target (VERDICT r1 item 7): <= 2x the plain-PBS per-op cost at batch 256,
decrypt-verified.  The GA step = fused external product (cmux_delta) +
permute gather + fused per-row automorphism keyswitch (auto_keyswitch).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def main():
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap_ga, rng, torus

    p = params.TFHEPP_L2
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    key = jax.random.PRNGKey(55)
    kk = jax.random.split(key, 5)
    t0 = time.time()
    kt = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bkg = jax.jit(lambda r, k_: bootstrap_ga.new_key(r, gk, k_))(kk[2], kt)
    jax.block_until_ready(bkg.ak_v)
    print(f"# GA keygen {time.time()-t0:.0f}s (ak "
          f"{(bkg.ak_v.nbytes + bkg.ak_vs.nbytes)/2**30:.2f} GiB)",
          file=sys.stderr, flush=True)

    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    slots = jnp.arange(batch) % 4
    ms = torus.double2torus(slots / 8.0)
    cs = jax.jit(lambda m, r: tlwe.encrypt(m, kt, r))(ms, kk[4])

    fb = jax.jit(lambda tv, c, bk: bootstrap_ga.functional_bootstrap_ga(
        tv, c, bk, 4))
    t0 = time.time()
    out = fb(tv, cs, bkg)
    jax.block_until_ready(out.b)
    print(f"# compile+run {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    ph = np.asarray(tlwe.phase(out, ko), np.uint64)
    want = np.asarray(luts, np.uint64)[np.asarray(slots)]
    err = np.abs((ph - want).view(np.int64).astype(np.float64)).max()
    ok = err <= 2.0**58
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fb(tv, cs, bkg)
        jax.block_until_ready(out.b)
        times.append(time.time() - t0)
    dt = min(times) / batch
    print(f"# GA bootstrap: {dt*1e3:.2f} ms/op (decrypt "
          f"{'OK' if ok else 'FAIL'}, err 2^{np.log2(err+1):.1f})",
          file=sys.stderr)
    row = {
        "metric": "ga_bootstrap_L2", "value": round(dt * 1e3, 3),
        "unit": "ms/bootstrap", "vs_baseline": None, "batch": batch,
        "decrypt_ok": bool(ok),
        "fused_perm": os.environ.get("MOSFHET_GA_FUSED", "1") == "1",
        "stream": os.environ.get("MOSFHET_GA_STREAM", "1") == "1",
        "onekernel": os.environ.get("MOSFHET_GA_ONEKERNEL", "0") == "1",
    }

    # MXU-NTT leg (same pattern as bench.py / bench_torus32): re-trace the
    # whole GA bootstrap with the int8-MXU plan, decrypt-verify, let the
    # faster verified plan win the row.  A Mosaic failure here must never
    # sink the row.
    if os.environ.get("BENCH_MXU", "1") == "1" and \
            os.environ.get("MOSFHET_NTT_MXU", "0") != "1":
        try:
            os.environ["MOSFHET_NTT_MXU"] = "1"
            fb_m = jax.jit(lambda tv, c, bk:
                           bootstrap_ga.functional_bootstrap_ga(tv, c, bk, 4))
            t0 = time.time()
            out = fb_m(tv, cs, bkg)
            jax.block_until_ready(out.b)
            print(f"# mxu compile+run {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            ph = np.asarray(tlwe.phase(out, ko), np.uint64)
            err_m = np.abs((ph - want).view(np.int64)
                           .astype(np.float64)).max()
            ok_m = bool(err_m <= 2.0**58)
            tms = []
            for _ in range(reps):
                t0 = time.time()
                out = fb_m(tv, cs, bkg)
                jax.block_until_ready(out.b)
                tms.append(time.time() - t0)
            dt_m = min(tms) / batch
            print(f"# GA bootstrap (mxu): {dt_m*1e3:.2f} ms/op (decrypt "
                  f"{'OK' if ok_m else 'FAIL'})", file=sys.stderr)
            row["mxu_ms"] = round(dt_m * 1e3, 3)
            row["mxu_decrypt_ok"] = ok_m
            if ok_m and dt_m < dt:
                row["value"] = round(dt_m * 1e3, 3)
                row["decrypt_ok"] = ok_m
                row["ntt"] = "mxu"
                row["rollntt_ms"] = round(dt * 1e3, 3)
        except Exception as e:
            print(f"# mxu leg failed: {str(e)[-400:]}",
                  file=sys.stderr, flush=True)
            row["mxu_error"] = str(e)[-200:]
        finally:
            os.environ.pop("MOSFHET_NTT_MXU", None)

    print(json.dumps(row))


if __name__ == "__main__":
    main()
