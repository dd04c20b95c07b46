"""Single-chip proxy for the kernel-TP (gadget-sharded) blind rotate.

Real model=2 sharding needs two chips (this project has one); what CAN
be measured on one chip is the compute-side overhead of the TP split:
each step runs the partial kernel TWICE (J/2 rows each), adds the two
exact NTT-domain partials locally (standing in for the ICI psum), and
finishes (inverse NTT + garner + carry) in the finish kernel — exactly
the per-chip work of a 2-way model shard.  Compared against the fused
single-kernel step scan on the same batch.  ICI transfer time is NOT
included (no second chip); the SCALING.md cost model covers it.

Decrypt-verified.  One JSON line per row.
"""

import json
import math
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
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
    from mosfhet_tpu.ops import pbs_kernel as pk

    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    if smoke:                      # CPU logic check: tiny params, interpret
        p = params.TFHEParams(
            n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
            lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="TP_SMOKE")
        batch = 32
    else:
        p = params.TFHEPP_L2
        batch = int(os.environ.get("BENCH_BATCH", "256"))
    interp = smoke
    reps = int(os.environ.get("BENCH_REPS", "3"))
    kk = jax.random.split(jax.random.PRNGKey(31337), 5)
    t0 = time.time()
    kt = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    kr = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    ko = trlwe.extract_tlwe_key(kr)
    gk = trgsw.new_key(kr, p.l, p.Bg_bit)
    bk = jax.jit(lambda rk, k_: bootstrap.new_key(rk, gk, k_, 1))(kk[2], kt)
    jax.block_until_ready(bk.v)
    log(f"# keygen {time.time()-t0:.1f}s")

    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
    cs = tlwe.encrypt(ms, kt, kk[4])

    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    J = (k + 1) * l
    log_N2 = int(math.log2(2 * N))
    kp = pk.get_kernel_plan(N, bk.primes, l, Bg_bit, k)

    def prep(c_b, c_a):
        b_int = torus.torus2int(
            c_b + bootstrap._prec_offset(4), log_N2).astype(jnp.int32)
        acc0 = trlwe.mul_by_xai(tv, 2 * N - b_int).stacked()
        acc0 = acc0.reshape(batch, k + 1, N)
        a_int = torus.torus2int(c_a, log_N2).astype(jnp.int32)
        return acc0, jnp.moveaxis(a_int, -1, 0)

    v32 = bk.v.astype(jnp.uint32)
    vs32 = bk.vs.astype(jnp.uint32)

    # ---- baseline: fused single-kernel step scan -------------------------
    def run_fused(c_b, c_a, v, vs):
        acc0, a_scan = prep(c_b, c_a)
        return pk.blind_rotate_scan(acc0, a_scan, v, vs, kp,
                                    interpret=interp)

    f_fused = jax.jit(run_fused)

    # ---- TP-split proxy: 2x partial (J/2 rows) + local sum + finish ------
    jl = J // 2
    j0a = jnp.zeros((1,), jnp.int32)
    j0b = jnp.full((1,), jl, jnp.int32)

    def run_split(c_b, c_a, v, vs):
        acc0, a_scan = prep(c_b, c_a)
        B = acc0.shape[0]
        nb = B // kp.bt
        tiles = pk.split_limbs(acc0, kp)
        a_tiles = a_scan.reshape(a_scan.shape[0], nb, kp.bt, 1)

        def step(carry, xs):
            va, vsa, ai = xs
            s0 = pk.partial_step_tiles(carry, ai, j0a, va[:jl], vsa[:jl],
                                       kp, interpret=interp)
            s1 = pk.partial_step_tiles(carry, ai, j0b, va[jl:], vsa[jl:],
                                       kp, interpret=interp)
            spec = s0 + s1                       # local stand-in for psum
            return pk.finish_step_tiles(carry, spec, kp, 2,
                                        interpret=interp), None

        out, _ = jax.lax.scan(step, tiles, (v, vs, a_tiles))
        return pk.merge_limbs(out)

    f_split = jax.jit(run_split)

    rows = []
    for name, fn in (("fused", f_fused), ("tp_split2", f_split)):
        t0 = time.time()
        acc = fn(cs.b, cs.a, v32, vs32)
        jax.block_until_ready(acc)
        log(f"# {name} first call {time.time()-t0:.1f}s")
        rot = trlwe.TRLWE(acc[:, :k], acc[:, k])
        o = trlwe.extract_tlwe(rot, 0)
        ph = jnp.asarray(jax.jit(tlwe.phase)(o, ko), jnp.uint64)
        want = luts[jnp.arange(batch) % 4]
        err = jnp.abs((ph - want).astype(jnp.int64).astype(jnp.float64))
        ok = bool(jnp.all(err <= 2.0**58))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            acc = fn(cs.b, cs.a, v32, vs32)
            jax.block_until_ready(acc)
            ts.append(time.time() - t0)
        ms_op = min(ts) / batch * 1e3
        log(f"# {name}: {ms_op:.3f} ms/op decrypt {'OK' if ok else 'FAIL'}")
        rows.append({"metric": f"blind_rotate_{name}_L2",
                     "value": round(ms_op, 3), "unit": "ms/op",
                     "batch": batch, "decrypt_ok": ok})
    ratio = rows[1]["value"] / rows[0]["value"]
    rows.append({"metric": "tp_split2_overhead", "value": round(ratio, 3),
                 "unit": "x fused (compute only, ICI excluded)"})
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
