"""Seeded (compressed) vs plain LUT-packing KS keys — HBM-footprint
experiment (the `test/bench_seeded.c` analog).

The reference measures compressed-vs-plain `subto` as a function of
working-set size (a CPU cache-pressure experiment, `bench_seeded.c:86-97`).
The TPU analog is HBM pressure: the packing KS key is the largest key
object (GiB-scale at production params); the seeded form halves it
(seed + b only) at the cost of regenerating masks.  Measured here:

- footprints of both forms,
- one-time expansion cost (seeded -> dense),
- the apply cost with a dense table vs expand-every-use (the streaming
  mode a key-sharded deployment would pay).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from mosfhet_tpu import params, tlwe, trlwe, keyswitch as ks, rng, torus

    p = params.UFHE_SET0
    B = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    key = jax.random.PRNGKey(31)
    kk = jax.random.split(key, 6)
    key_trlwe = trlwe.new_binary_key(kk[0], p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    # table-scale knob: torus_base (keeps t*base_bit decomposition depth,
    # so correctness is unaffected; halves the table at tb=2)
    tb = int(os.environ.get("BENCH_TB", "4"))
    t_ks = p.t

    t0 = time.time()
    dense = jax.jit(lambda r, ok, ik: ks.new_lut_packing_ks_key(
        r, ok, ik, t_ks, p.base_bit, tb))(kk[1], key_trlwe, key_out)
    jax.block_until_ready(dense.table)
    log(f"# dense keygen {time.time()-t0:.0f}s "
        f"({dense.table.nbytes/2**30:.2f} GiB)")
    t0 = time.time()
    seeded = jax.jit(lambda r, ok, ik: ks.new_lut_packing_ks_key_seeded(
        r, ok, ik, t_ks, p.base_bit, tb))(kk[2], key_trlwe, key_out)
    jax.block_until_ready(seeded.b)
    s_bytes = seeded.b.nbytes + seeded.seeds.nbytes
    log(f"# seeded keygen {time.time()-t0:.0f}s ({s_bytes/2**30:.2f} GiB)")

    ms = torus.double2torus((jnp.arange(tb * B) % tb).reshape(tb, B) / 8.0)
    cs = tlwe.encrypt(ms, key_out, kk[3])
    cs = tlwe.TLWE(a=jnp.moveaxis(cs.a, 0, 1), b=jnp.moveaxis(cs.b, 0, 1))

    ap_d = jax.jit(lambda c, k_: ks.lut_packing_keyswitch(c, k_))
    ap_s = jax.jit(lambda c, sk: ks.lut_packing_keyswitch(
        c, ks.expand_lut_packing_ks_key(sk)))

    def run(f, arg):
        out = f(cs, arg)
        jax.block_until_ready(out.b)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(cs, arg)
            jax.block_until_ready(out.b)
            ts.append(time.time() - t0)
        return min(ts), out

    dense_bytes = dense.table.nbytes
    td, out_d = run(ap_d, dense)
    # drop the dense table before the expanding path (4.5 GiB + its
    # expanded twin + gather intermediates exceed HBM otherwise)
    del dense
    import gc
    gc.collect()

    expand = jax.jit(ks.expand_lut_packing_ks_key)
    t0 = time.time()
    tab = expand(seeded)
    jax.block_until_ready(tab.table)
    log(f"# expand compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        tab2 = expand(seeded)
        jax.block_until_ready(tab2.table)
        del tab2
        ts.append(time.time() - t0)
    exp_ms = min(ts) * 1e3
    del tab
    gc.collect()

    ts_, out_s = run(ap_s, seeded)
    ph = np.asarray(trlwe.phase(out_s, key_trlwe), np.uint64)
    slot = p.N // tb
    want = np.repeat(np.asarray(ms, np.uint64).T, slot, axis=-1)
    err = np.abs((ph - want).view(np.int64).astype(np.float64)).max()
    ok = err <= 2.0**58
    log(f"# apply dense {td/B*1e3:.2f} ms/op, expand-per-use "
        f"{ts_/B*1e3:.2f} ms/op (decrypt {'OK' if ok else 'FAIL'}, "
        f"err 2^{np.log2(err+1):.1f})")
    print(json.dumps({
        "metric": "packing_ks_seeded", "unit": "report",
        "dense_gib": round(dense_bytes / 2**30, 3),
        "seeded_gib": round(s_bytes / 2**30, 3),
        "compression": round(dense_bytes / s_bytes, 2),
        "expand_ms": round(exp_ms, 1),
        "apply_dense_ms_per_op": round(td / B * 1e3, 3),
        "apply_expanding_ms_per_op": round(ts_ / B * 1e3, 3),
        "batch": B, "decrypt_ok": bool(ok),
    }))


if __name__ == "__main__":
    main()
