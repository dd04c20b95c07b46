"""Parameter-set matrix: functional bootstrap correctness + speed for every
registry set, on real hardware.

The reference hard-codes parameter sets per harness and documents that
some tests fail for some sets ("It is expected for many of the tests to
fail depending on the parameters", reference README:83; SURVEY.md §4.5).
This harness makes that an explicit measured matrix: for each set it runs
a batched 2-bit-LUT programmable bootstrap and reports the max phase error
and whether it decodes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/param_matrix.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def run_set(name, batch=32):
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus

    p = params.get_params(name)
    key = jax.random.PRNGKey(hash(name) % (1 << 31))
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    t0 = time.time()
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = jax.jit(lambda r, kt: bootstrap.new_key(r, gk, kt, 1))(k2, key_tlwe)
    jax.block_until_ready(bk.v)
    keygen_s = time.time() - t0

    luts = rng.uniform_torus(k3, (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
    cs = jax.jit(tlwe.encrypt)(ms, key_tlwe, k4)
    f = jax.jit(lambda tv, cs, bk: bootstrap.functional_bootstrap(
        tv, cs, bk, 4))
    t0 = time.time()
    out = f(tv, cs, bk)
    jax.block_until_ready(out.b)
    first_s = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        out = f(tv, cs, bk)
        jax.block_until_ready(out.b)
        ts.append(time.time() - t0)

    ph = np.asarray(jax.jit(tlwe.phase)(out, key_out), np.uint64)
    want = np.asarray(luts)[np.arange(batch) % 4]
    d = np.abs(ph.astype(np.float64) - want.astype(np.float64))
    err = np.minimum(d, 2.0**64 - d).max()
    # decodes iff error below half the LUT slot (torus_base 4 -> 2^61)
    ok = bool(err < 2.0**58)
    rec = {"set": name, "n": p.n, "N": p.N, "l": p.l, "Bg_bit": p.Bg_bit,
           "pbs_ms_per_op": round(min(ts) / batch * 1e3, 3),
           "keygen_s": round(keygen_s, 1),
           "max_phase_err_log2": round(float(np.log2(err + 1.0)), 1),
           "decodes": ok}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    sets = sys.argv[1:] or ["SET_1", "SET_2", "SET_3", "TFHEPP_L2",
                            "UFHE_SET0"]
    for name in sets:
        try:
            run_set(name)
        except Exception as e:  # report, keep going
            print(json.dumps({"set": name, "error": f"{type(e).__name__}: "
                              f"{str(e)[:160]}"}), flush=True)


if __name__ == "__main__":
    main()
