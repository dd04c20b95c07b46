"""Headline benchmark: batched programmable-bootstrap throughput on one chip.

Mirrors the reference's `test/benchmark.c:263-265` (functional bootstrap,
unfold=1, TFHEpp Level-2 parameters: n=632, N=2048, k=1, l=4, Bg_bit=9).
Baseline (BASELINE.md): 40.9 ms/bootstrap single-core AVX-512 = 24.4/s.

Prints ONE JSON line:
  {"metric": "pbs_throughput", "value": <bootstraps/sec>, "unit": "boot/s",
   "vs_baseline": <value / 24.4>}
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

# Setup latency is ~100% XLA compile time (round-5 split: keygen compile
# 261 s vs run 0.3 s) — persist compiled executables across runs.
# Harmless no-op if the backend cannot serialize executables.
if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1":
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/root/.cache/jax_mosfhet"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def _subbench_env():
    """Build the TORUS32 sub-bench environment.  ALWAYS prepend the repo
    root: the round-3 driver pre-set a PYTHONPATH without /root/repo and the
    child died with ModuleNotFoundError, losing the torus32_* headline
    fields.  Prepend, never setdefault.  (Unit-tested in
    tests/test_bench_env.py.)"""
    env = dict(os.environ)
    env["MOSFHET_TORUS_BITS"] = "32"
    repo_root = os.path.dirname(os.path.abspath(__file__))
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = ":".join(
        [repo_root, "/root/.axon_site"] + ([prev] if prev else []))
    return env


def _run_torus32_leg():
    """Run the TORUS32 sub-bench as a subprocess BEFORE this process creates
    its own TPU client (the axon tunnel serves one client at a time — round 2
    ran it after, and the child hung with empty stdout).  Returns the child's
    JSON row or None; failures carry the child's stderr tail."""
    import subprocess
    env = _subbench_env()
    try:
        r = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "bench_torus32.py")],
            env=env, capture_output=True, text=True, timeout=3000)
        lines = r.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"empty stdout (exit {r.returncode}); "
                f"stderr tail: {r.stderr.strip()[-400:]}")
        row = json.loads(lines[-1])
        if row.get("skipped"):
            print(f"# torus32 sub-bench skipped: {row['skipped']}",
                  file=sys.stderr)
            return None
        return row
    except Exception as e:  # never fail the headline metric
        print(f"# torus32 sub-bench failed: {e}", file=sys.stderr)
        return None


def _device_reachable(timeout_s: int = 180) -> bool:
    """Probe the accelerator in a SUBPROCESS (this process must not create
    its TPU client before the TORUS32 leg, and a downed axon tunnel hangs
    device init forever — fail fast with a structured row instead)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            env=dict(os.environ), capture_output=True, text=True,
            timeout=timeout_s)
        return r.stdout.strip().endswith("ok")
    except Exception:
        return False


def main():
    if os.environ.get("BENCH_DEVICE_PROBE", "1") == "1" and \
            os.environ.get("PALLAS_AXON_POOL_IPS") and \
            not _device_reachable():
        print(json.dumps({
            "metric": "pbs_throughput_L2_unfold1", "value": 0,
            "unit": "bootstraps/s", "vs_baseline": 0, "decrypt_ok": False,
            "error": "TPU device init timed out (axon tunnel down)",
        }), flush=True)
        return

    torus32_row = None
    if os.environ.get("BENCH_TORUS32", "1") == "1":
        torus32_row = _run_torus32_leg()

    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus

    p = params.TFHEPP_L2
    on_accel = jax.devices()[0].platform in ("tpu", "axon", "gpu")
    default_batch = "512" if on_accel else "8"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    if not on_accel:
        print(f"# WARNING: no accelerator ({jax.devices()[0].platform}); "
              f"batch {batch}", file=sys.stderr)

    key = jax.random.PRNGKey(2024)
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    t0 = time.time()
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    # split keygen compile from keygen run: the two trims are different
    # (cache/AOT vs kernel work), so the bench reports both
    bk_fn = jax.jit(lambda rk, kt: bootstrap.new_key(rk, gk, kt, 1))
    compiled = bk_fn.lower(k2, key_tlwe).compile()
    keygen_compile_s = time.time() - t0
    t0 = time.time()
    bk = compiled(k2, key_tlwe)
    jax.block_until_ready(bk.v)
    keygen_run_s = time.time() - t0
    print(f"# keygen: compile {keygen_compile_s:.1f}s + run "
          f"{keygen_run_s:.1f}s  bk.v {bk.v.shape} "
          f"{bk.v.nbytes/2**20:.0f} MiB (x2 shoup)", file=sys.stderr)

    luts = rng.uniform_torus(k3, (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus((jnp.arange(batch) % 4) / 8.0)
    cs = jax.jit(lambda m, kk: tlwe.encrypt(m, key_tlwe, kk))(ms, k4)

    # NB: the bootstrap key must be a jit *argument* — closing over it would
    # embed ~1 GiB of constants into the compile payload.
    pbs_fn = jax.jit(lambda tv, cs, bk: bootstrap.functional_bootstrap(
        tv, cs, bk, 4))
    pbs = lambda tv, cs: pbs_fn(tv, cs, bk)

    t0 = time.time()
    out = pbs(tv, cs)
    jax.block_until_ready(out.b)
    pbs_compile_s = time.time() - t0
    print(f"# first call (compile+run): {pbs_compile_s:.1f}s",
          file=sys.stderr)

    # correctness spot-check: decrypt and compare slots
    ph = jnp.asarray(jax.jit(tlwe.phase)(out, key_out), jnp.uint64)
    want = luts[jnp.arange(batch) % 4]
    err = jnp.abs((ph - want).astype(jnp.int64).astype(jnp.float64))
    ok = bool(jnp.all(err <= 2.0**58))
    print(f"# decrypt check: {'OK' if ok else 'FAIL'} "
          f"(max err 2^{float(jnp.log2(jnp.maximum(err.max(), 1.0))):.1f})",
          file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = pbs(tv, cs)
        jax.block_until_ready(out.b)
        times.append(time.time() - t0)
    dt = min(times)
    thr = batch / dt
    print(f"# {dt*1e3:.1f} ms / {batch} bootstraps = "
          f"{dt/batch*1e3:.2f} ms/bootstrap", file=sys.stderr)
    result = {
        "metric": "pbs_throughput_L2_unfold1",
        "value": round(thr, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(thr / 24.4, 2),
        "batch": batch,
        "decrypt_ok": ok,
        # active NTT prime set — makes ablation legs (e.g.
        # MOSFHET_NTT_PRIMES=narrow) self-documenting in the results
        "primes": list(int(q) for q in bk.primes),
        # setup latency (time-to-first-bootstrap tracking)
        "keygen_compile_s": round(keygen_compile_s, 1),
        "keygen_run_s": round(keygen_run_s, 1),
        "pbs_compile_s": round(pbs_compile_s, 1),
    }


    # -- alternate-plan leg: the NTT plan defaults to int8-MXU tails
    # (MOSFHET_NTT_MXU=1 since round 3); re-trace with the OTHER plan
    # (roll when primary is MXU, and vice versa) as an in-process
    # comparison.  The faster decrypt-verified path wins the headline;
    # both are reported.  A Mosaic/compile failure here must never sink
    # the headline row.
    primary_is_mxu = os.environ.get("MOSFHET_NTT_MXU", "1") == "1"
    result["ntt"] = "mxu" if primary_is_mxu else "roll"
    if os.environ.get("BENCH_MXU", "1") == "1" and on_accel:
        alt = "roll" if primary_is_mxu else "mxu"
        saved = os.environ.get("MOSFHET_NTT_MXU")
        try:
            os.environ["MOSFHET_NTT_MXU"] = "0" if primary_is_mxu else "1"
            pbs_alt = jax.jit(lambda tv, cs, bk: bootstrap.
                              functional_bootstrap(tv, cs, bk, 4))
            t0 = time.time()
            out = pbs_alt(tv, cs, bk)
            jax.block_until_ready(out.b)
            print(f"# {alt} first call (compile+run): {time.time()-t0:.1f}s",
                  file=sys.stderr)
            ph = jnp.asarray(jax.jit(tlwe.phase)(out, key_out), jnp.uint64)
            err = jnp.abs((ph - want).astype(jnp.int64).astype(jnp.float64))
            ok_alt = bool(jnp.all(err <= 2.0**58))
            tms = []
            for _ in range(reps):
                t0 = time.time()
                out = pbs_alt(tv, cs, bk)
                jax.block_until_ready(out.b)
                tms.append(time.time() - t0)
            thr_alt = batch / min(tms)
            print(f"# {alt}: {min(tms)*1e3:.1f} ms / {batch} = "
                  f"{min(tms)/batch*1e3:.2f} ms/bootstrap "
                  f"(decrypt {'OK' if ok_alt else 'FAIL'})", file=sys.stderr)
            result[f"{alt}ntt_boot_s"] = round(thr_alt, 2)
            result[f"{alt}ntt_decrypt_ok"] = ok_alt
            if ok_alt and thr_alt > thr:
                result["value"] = round(thr_alt, 2)
                result["vs_baseline"] = round(thr_alt / 24.4, 2)
                result["ntt"] = alt
                pri = "mxu" if primary_is_mxu else "roll"
                result[f"{pri}ntt_boot_s"] = round(thr, 2)
        except Exception as e:
            print(f"# {alt} leg failed: {str(e)[-400:]}", file=sys.stderr)
            result[f"{alt}_error"] = str(e)[-200:]
        finally:
            if saved is None:
                os.environ.pop("MOSFHET_NTT_MXU", None)
            else:
                os.environ["MOSFHET_NTT_MXU"] = saved

    # -- MFU / roofline for the WINNING plan: count VPU ops, MXU MACs and
    # HBM bytes of the actual traced program (utils/roofline.py) and
    # report the achieved fraction of the chip's speed-of-light on the
    # binding resource.  Tracing only — no device work; must never sink
    # the headline row.
    if os.environ.get("BENCH_MFU", "1") == "1" and result["value"] > 0:
        saved_mfu = os.environ.get("MOSFHET_NTT_MXU")
        try:
            from mosfhet_tpu.utils import roofline
            os.environ["MOSFHET_NTT_MXU"] = \
                "1" if result["ntt"] == "mxu" else "0"
            counts = roofline.count_pbs(p, batch)
            result.update(roofline.report(counts, 1.0 / result["value"]))
            print(f"# roofline: bound={result['bound']} "
                  f"mfu={result['mfu']} sol={result['sol_ms']} ms/boot",
                  file=sys.stderr)
        except Exception as e:
            print(f"# roofline counting failed: {str(e)[-200:]}",
                  file=sys.stderr)
        finally:
            if saved_mfu is None:
                os.environ.pop("MOSFHET_NTT_MXU", None)
            else:
                os.environ["MOSFHET_NTT_MXU"] = saved_mfu

    # TORUS32 row (the reference's -DTORUS32 build, measured as a
    # subprocess before this client attached to the device)
    if torus32_row is not None:
        result["torus32_boot_s"] = torus32_row["value"]
        result["torus32_decrypt_ok"] = torus32_row["decrypt_ok"]
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
