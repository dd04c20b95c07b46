"""TORUS32 PBS throughput on TPU (single-limb kernel, 2 primes)."""
import json, time, sys, math
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
# run with PYTHONPATH=/root/repo MOSFHET_TORUS_BITS=32

if jax.devices()[0].platform not in ("tpu", "axon", "gpu"):
    print(json.dumps({"metric": "pbs_throughput_L2_torus32",
                      "skipped": f"no accelerator "
                                 f"({jax.devices()[0].platform})"}))
    sys.exit(0)

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
assert torus.TORUS_BITS == 32

p = params.TFHEParams(n=632, N=2048, k=1, l=3, Bg_bit=7, t=6, base_bit=4,
                      lwe_sigma=2.0**-15, rlwe_sigma=2.0**-25, name="L2_32")
key = jax.random.PRNGKey(2024)
k0, k1, k2, k3, k4 = jax.random.split(key, 5)
kt = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
kr = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
ko = trlwe.extract_tlwe_key(kr)
gk = trgsw.new_key(kr, p.l, p.Bg_bit)
t0 = time.time()
bk = jax.jit(lambda r, kk: bootstrap.new_key(r, gk, kk, 1))(k2, kt)
jax.block_until_ready(bk.v)
print(f"keygen {time.time()-t0:.0f}s; primes={bk.primes} "
      f"bk {bk.v.nbytes/2**20:.0f} MiB", flush=True)

B = 512
luts = rng.uniform_torus(k3, (4,))
tv = trlwe.torus_packing(luts, p.k, p.N)
ms = torus.double2torus((jnp.arange(B) % 4) / 8.0)
cs = jax.jit(tlwe.encrypt)(ms, kt, k4)
f = jax.jit(lambda tv, cs, bk: bootstrap.functional_bootstrap(tv, cs, bk, 4))
t0 = time.time()
out = f(tv, cs, bk); jax.block_until_ready(out.b)
print(f"first call {time.time()-t0:.0f}s", flush=True)
ph = np.asarray(jax.jit(tlwe.phase)(out, ko))
want = np.asarray(luts)[np.arange(B) % 4]
d = np.abs(ph.astype(np.float64) - want.astype(np.float64))
err = np.minimum(d, 2.0**32 - d).max()
print(f"max err 2^{np.log2(err+1):.1f} {'OK' if err < 2**26 else 'FAIL'}",
      flush=True)
ts = []
for _ in range(3):
    t0 = time.time(); out = f(tv, cs, bk); jax.block_until_ready(out.b)
    ts.append(time.time() - t0)
print(f"{min(ts)/B*1e3:.2f} ms/bootstrap -> {B/min(ts):.0f} boot/s (TORUS32)")
row = {"metric": "pbs_throughput_L2_torus32",
       "value": round(B / min(ts), 2), "unit": "bootstraps/s",
       "batch": B, "decrypt_ok": bool(err < 2**26)}

# Alternate-plan leg (same pattern as bench.py): the plan defaults to
# int8-MXU tails (round 3); re-trace with the OTHER plan, decrypt-verify,
# and let the faster verified path win the row.  Measured on v5e: 780
# boot/s MXU vs 660 roll.  A Mosaic failure here must never sink the row.
import os
primary_is_mxu = os.environ.get("MOSFHET_NTT_MXU", "1") == "1"
row["ntt"] = "mxu" if primary_is_mxu else "roll"
if os.environ.get("BENCH_MXU", "1") == "1":
    alt = "roll" if primary_is_mxu else "mxu"
    saved = os.environ.get("MOSFHET_NTT_MXU")
    try:
        os.environ["MOSFHET_NTT_MXU"] = "0" if primary_is_mxu else "1"
        f_alt = jax.jit(lambda tv, cs, bk: bootstrap.functional_bootstrap(
            tv, cs, bk, 4))
        t0 = time.time()
        out = f_alt(tv, cs, bk); jax.block_until_ready(out.b)
        print(f"{alt} first call {time.time()-t0:.0f}s", flush=True)
        ph = np.asarray(jax.jit(tlwe.phase)(out, ko))
        d = np.abs(ph.astype(np.float64) - want.astype(np.float64))
        err_alt = np.minimum(d, 2.0**32 - d).max()
        ok_alt = bool(err_alt < 2**26)
        tms = []
        for _ in range(3):
            t0 = time.time(); out = f_alt(tv, cs, bk)
            jax.block_until_ready(out.b)
            tms.append(time.time() - t0)
        print(f"{alt} {min(tms)/B*1e3:.2f} ms/bootstrap -> "
              f"{B/min(tms):.0f} boot/s (decrypt {'OK' if ok_alt else 'FAIL'})",
              flush=True)
        row[f"{alt}ntt_boot_s"] = round(B / min(tms), 2)
        row[f"{alt}ntt_decrypt_ok"] = ok_alt
        if ok_alt and min(tms) < min(ts):
            row["value"] = round(B / min(tms), 2)
            row["decrypt_ok"] = ok_alt
            row["ntt"] = alt
            pri = "mxu" if primary_is_mxu else "roll"
            row[f"{pri}ntt_boot_s"] = round(B / min(ts), 2)
    except Exception as e:
        print(f"{alt} leg failed: {str(e)[-400:]}", flush=True)
        row[f"{alt}_error"] = str(e)[-200:]
    finally:
        if saved is None:
            os.environ.pop("MOSFHET_NTT_MXU", None)
        else:
            os.environ["MOSFHET_NTT_MXU"] = saved

print(json.dumps(row))
