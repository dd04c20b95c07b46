"""End-to-end encrypted integer arithmetic on TPU at production parameters.

Mirrors the reference's `applications/multi-ciphertext-arith` demo with the
UFHE_SET0 keyset (`ufhe.c:18-20`): encrypt two integers, homomorphically
add / multiply / compare, decrypt, verify.  Prints JSON lines with wall
times per operation.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)


def main():
    from mosfhet_tpu import params
    from mosfhet_tpu.apps import ufhe

    prec = int(os.environ.get("UFHE_PREC", "6"))     # bits
    key = jax.random.PRNGKey(4242)
    k0, k1, k2, k3 = jax.random.split(key, 4)

    t0 = time.time()
    priv = ufhe.new_priv_keyset(k0, params.UFHE_SET0)
    pub = ufhe.new_public_keyset(k1, priv, torus_base=4)
    ctx = ufhe.setup_context(pub)
    print(f"# keygen {time.time()-t0:.0f}s", file=sys.stderr)

    va, vb = 23 % (1 << prec), 41 % (1 << prec)
    a = ufhe.encrypt_integer(k2, va, prec, False, priv, ctx)
    b = ufhe.encrypt_integer(k3, vb, prec, False, priv, ctx)

    # whole encrypted-integer ops are jittable: keysets are PyTree args
    add_j = jax.jit(ufhe.add_integer, static_argnums=(2,))
    mul_j = jax.jit(ufhe.mul_integer, static_argnums=(2,))
    cmp_j = jax.jit(ufhe.cmp_integer)

    results = {}
    t0 = time.time()
    s = add_j(a, b, a.d + 1, ctx)
    sv = ufhe.decrypt_integer(s, priv, ctx)
    results["add"] = {"time_s": round(time.time() - t0, 2),
                      "got": sv, "want": va + vb, "ok": sv == va + vb}

    t0 = time.time()
    m = mul_j(a, b, a.d + b.d, ctx)
    mv = ufhe.decrypt_integer(m, priv, ctx)
    results["mul"] = {"time_s": round(time.time() - t0, 2),
                      "got": mv, "want": va * vb, "ok": mv == va * vb}

    t0 = time.time()
    c = cmp_j(a, b, ctx)
    cv = ufhe.decrypt_integer(c, priv, ctx)
    want_cmp = 2 if va > vb else (1 if va == vb else 0)
    results["cmp"] = {"time_s": round(time.time() - t0, 2),
                      "got": cv, "want": want_cmp, "ok": cv == want_cmp}

    all_ok = all(r["ok"] for r in results.values())
    print(json.dumps({"metric": "ufhe_demo", "precision_bits": prec,
                      "ok": all_ok, **results}))


if __name__ == "__main__":
    main()
