"""Batched encrypted-integer throughput at steady state (UFHE_SET0).

Round 1 reported single-integer wall times including compile (add 37 s /
mul 186 s) — meaningless as throughput.  Here a BATCH of integer pairs
flows through one jitted add / mul / cmp, compile is excluded, and
throughput is digit-ops-per-second with decrypt verification of every
result (mirrors `applications/multi-ciphertext-arith`).
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
    from mosfhet_tpu import params, tlwe, torus
    from mosfhet_tpu.apps import ufhe

    prec = int(os.environ.get("UFHE_PREC", "6"))
    B = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    key = jax.random.PRNGKey(777)
    kk = jax.random.split(key, 6)

    t0 = time.time()
    priv = ufhe.new_priv_keyset(kk[0], params.UFHE_SET0)
    pub = ufhe.new_public_keyset(kk[1], priv, torus_base=4)
    ctx = ufhe.setup_context(pub)
    log(f"# keygen {time.time()-t0:.0f}s")

    rng_np = np.random.default_rng(3)
    va = rng_np.integers(0, 1 << prec, B)
    vb = rng_np.integers(0, 1 << prec, B)

    def encrypt_batch(vals, rk):
        d = ufhe._n_digits(prec, ctx)
        mask = ctx.torus_base - 1
        lt = ctx.log_torus_base
        digs = jnp.stack([(jnp.asarray(vals) >> (i * lt)) & mask
                          for i in range(d)])              # [d, B]
        c = tlwe.encrypt(ufhe._digit_torus(digs, ctx), priv.extracted, rk)
        return ufhe.Integer(digits=c, signed=False)

    def decrypt_batch(c):
        ph = tlwe.phase(c.digits, priv.extracted)          # [d, B]
        vals = jnp.round(
            torus.torus2double(ph) * (2 * ctx.torus_base)).astype(jnp.int64)
        vals = np.asarray(vals % ctx.torus_base)           # [d, B]
        out = np.zeros(vals.shape[1], dtype=np.int64)
        for i in range(vals.shape[0] - 1, -1, -1):
            out = (out << ctx.log_torus_base) | vals[i]
        return out

    a = encrypt_batch(va, kk[2])
    b = encrypt_batch(vb, kk[3])

    results = []

    def bench(name, fn, want, mod, digit_ops):
        jf = jax.jit(fn)
        t0 = time.time()
        out = jf(a, b, ctx)
        jax.block_until_ready(out.digits.b)
        log(f"# {name} compile+run {time.time()-t0:.0f}s")
        got = decrypt_batch(out) % mod
        ok = bool(np.array_equal(got, want % mod))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = jf(a, b, ctx)
            jax.block_until_ready(out.digits.b)
            ts.append(time.time() - t0)
        dt = min(ts)
        thr = B / dt
        log(f"# {name}: {dt/B*1e3:.1f} ms/integer-op = {thr:.1f} int-ops/s "
            f"({'OK' if ok else 'FAIL'})")
        results.append({
            "metric": f"ufhe_{name}_batched", "value": round(thr, 2),
            "unit": "integer-ops/s", "batch": B, "precision_bits": prec,
            "ms_per_op": round(dt / B * 1e3, 2), "decrypt_ok": ok,
        })

    d_out = ufhe._n_digits(prec, ctx) + 1
    bench("add", lambda a, b, ctx: ufhe.add_integer(a, b, d_out, ctx),
          va + vb, 1 << (d_out * ctx.log_torus_base), 1)
    d_mul = 2 * ufhe._n_digits(prec, ctx)
    bench("mul", lambda a, b, ctx: ufhe.mul_integer(a, b, d_mul, ctx),
          va * vb, 1 << (2 * prec), 1)
    want_cmp = np.where(va > vb, 2, np.where(va == vb, 1, 0))
    bench("cmp", lambda a, b, ctx: ufhe.cmp_integer(a, b, ctx),
          want_cmp, 4, 1)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
