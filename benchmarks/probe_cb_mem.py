"""SET_3 circuit-bootstrap memory probe: generate the CB key chain step by
step on the real chip, printing device memory stats and the FULL error on
failure — the round-4 matrix rows truncated the OOM message to 80 chars,
hiding which allocation died (`full_matrix_r4_perop2.jsonl`).

Order matters: the two multi-GiB seeded tables are generated FIRST (while
nothing else is resident), the bootstrap key LAST."""

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def stats(tag):
    try:
        m = jax.local_devices()[0].memory_stats()
        used = m.get("bytes_in_use", 0) / 2**30
        peak = m.get("peak_bytes_in_use", 0) / 2**30
        lim = m.get("bytes_limit", 0) / 2**30
        print(f"# mem[{tag}]: in_use {used:.2f} GiB  peak {peak:.2f}  "
              f"limit {lim:.2f}", file=sys.stderr, flush=True)
        return {"tag": tag, "in_use_gib": round(used, 2),
                "peak_gib": round(peak, 2)}
    except Exception as e:
        print(f"# mem[{tag}]: unavailable ({e})", file=sys.stderr)
        return {"tag": tag}


def main():
    from mosfhet_tpu import (params, tlwe, trlwe, trgsw, bootstrap,
                             keyswitch as ks, rng, torus)
    set_name = os.environ.get("CB_SET", "SET_3")
    p = params.get_params(set_name)
    KEY = jax.random.PRNGKey(20260820)
    kk = jax.random.split(KEY, 10)
    rows = []

    def step(tag, fn):
        t0 = time.time()
        try:
            v = fn()
            jax.block_until_ready(jax.tree.leaves(v)[0])
            rows.append({"step": tag, "ok": True,
                         "s": round(time.time() - t0, 1),
                         "mem": stats(tag)})
            print(json.dumps(rows[-1]), flush=True)
            return v
        except Exception as ex:
            msg = "".join(traceback.format_exception_only(type(ex), ex))
            rows.append({"step": tag, "ok": False,
                         "s": round(time.time() - t0, 1),
                         "err": msg[-1200:], "mem": stats(tag)})
            print(json.dumps(rows[-1]), flush=True)
            raise SystemExit(1)

    key_tlwe = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    stats("base")

    # MOSFHET_KEYGEN_HOST=1 uses the host-staged table generator, which
    # must run OUTSIDE jit (it stages spans through host RAM)
    hoststaged = os.environ.get("MOSFHET_KEYGEN_HOST") == "1"

    def maybe_jit(fn):
        return fn if hoststaged else jax.jit(fn)

    def gen_packing1():
        return step("packing1_seeded", lambda: maybe_jit(
            lambda r, ok, ik: ks.new_packing1_ks_key_seeded(
                r, ok, ik, p.t, p.base_bit))(kk[6], key_trlwe, key_out))

    def gen_priv():
        return step("priv_sk_seeded", lambda: maybe_jit(
            lambda r, ok, ik: ks.new_priv_sk_ks_key_seeded(
                r, ok, ik, p.t, p.base_bit))(kk[7], key_trlwe, key_out))

    # CB_ORDER=priv_first: diagnose whether the priv-SK keygen OOM is
    # program-internal (fails alone too) or residency (only fails next
    # to the resident packing1 table)
    if os.environ.get("CB_ORDER") == "priv_first":
        kska = gen_priv()
        ksk1 = gen_packing1()
    else:
        ksk1 = gen_packing1()
        kska = gen_priv()
    bk = step("bk", lambda: jax.jit(
        lambda r, k_: bootstrap.new_key(r, gk, k_, 1))(kk[2], key_tlwe))

    # the op itself
    import math
    import numpy as np
    m0 = rng.uniform_torus(jax.random.fold_in(KEY, 17), (p.N,))
    ctrl = trlwe.encrypt(m0, key_trlwe, jax.random.fold_in(KEY, 18))
    cb_in = tlwe.encrypt(torus.double2torus(1 / 4.0), key_tlwe,
                         jax.random.fold_in(KEY, 19))

    def cb_fn(c, bk, kska, kskb, ctrl):
        g = bootstrap.circuit_bootstrap(c, bk, kska, kskb, p.l, p.Bg_bit)
        return trgsw.external_product(ctrl, trgsw.to_dft(g, gk.plan()))

    out = step("circuit_bootstrap", lambda: jax.jit(cb_fn)(
        cb_in, bk, kska, ksk1, ctrl))
    e = np.abs(np.asarray(
        jnp.asarray(trlwe.phase(out, key_trlwe), jnp.uint64)
        - jnp.asarray(m0, jnp.uint64)).view(np.int64).astype(np.float64))
    import math
    print(json.dumps({"step": "decrypt", "set": set_name,
                      "err_log2": round(math.log2(e.max() + 1), 1),
                      "ok": bool(e.max() <= 2.0**59)}), flush=True)


if __name__ == "__main__":
    main()
