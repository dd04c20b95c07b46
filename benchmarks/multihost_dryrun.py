"""Multi-host dryrun: N real OS processes, one coordinator, global-mesh PBS.

Simulates an N-host deployment on one machine: each process owns
8/N virtual CPU devices, joins the cluster over TCP
(`jax.distributed.initialize`), contributes its local batch shard, and the
batched bootstrap runs on the global (data,) mesh with replicated keys.
Every process decrypt-verifies its gathered results.

Usage:  python benchmarks/multihost_dryrun.py [nproc]   (default 2)
"""

import os
import subprocess
import sys
import time


def worker(nproc: int, rank: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={8 // nproc}").strip()
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
    from mosfhet_tpu.parallel import multihost as mh

    active = mh.initialize(coordinator=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=rank)
    assert active and jax.process_count() == nproc
    mesh = mh.make_global_mesh(model=1)

    p = params.TFHEParams(n=16, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
                          lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44,
                          name="MH_DRYRUN")
    # identical keys on every host (same PRNG seed = the setup broadcast)
    key = jax.random.PRNGKey(11)
    k0, k1, k2, k3 = jax.random.split(key, 4)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, key_tlwe, 1)
    luts = rng.uniform_torus(k3, (4,))
    tv1 = trlwe.torus_packing(luts, p.k, p.N)

    # each host encrypts ITS local batch shard
    local_b = 8 // nproc * 2
    global_b = local_b * nproc
    slots = (rank * local_b + jnp.arange(local_b)) % 4
    ms = torus.double2torus(slots / 8.0)
    cs_local = tlwe.encrypt(ms, key_tlwe,
                            jax.random.fold_in(key, 100 + rank))

    # DCN scatter: local shards -> global sharded arrays
    ca = mh.distribute_batch(np.asarray(cs_local.a), mesh)
    cb = mh.distribute_batch(np.asarray(cs_local.b), mesh)
    tv_a = mh.distribute_batch(
        np.broadcast_to(np.asarray(tv1.a), (local_b,) + tv1.a.shape).copy(),
        mesh)
    tv_b = mh.distribute_batch(
        np.broadcast_to(np.asarray(tv1.b), (local_b,) + tv1.b.shape).copy(),
        mesh)
    bk_g = mh.replicate(bk, mesh)   # one DCN key broadcast at setup

    run = mh.pbs_on_global_mesh(mesh, bk_g, torus_base=4, model_axis=None)
    out = run(trlwe.TRLWE(a=tv_a, b=tv_b), tlwe.TLWE(a=ca, b=cb))
    jax.block_until_ready(out.b)

    # DCN gather + decrypt-verify everywhere
    ph_a = mh.gather_results(out.a)
    ph_b = mh.gather_results(out.b)
    full = tlwe.TLWE(a=jnp.asarray(ph_a), b=jnp.asarray(ph_b))
    ph = np.asarray(tlwe.phase(full, key_out), np.uint64)
    want = np.asarray(luts, np.uint64)[np.arange(global_b) % 4]
    err = np.abs((ph - want).view(np.int64).astype(np.float64)).max()
    assert err <= float(1 << 58), f"rank {rank}: err 2^{np.log2(err+1):.1f}"
    print(f"rank {rank}/{nproc}: OK global_batch={global_b} "
          f"devices={len(jax.devices())} local={jax.local_device_count()} "
          f"err 2^{np.log2(err + 1):.1f}", flush=True)


def main():
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if os.environ.get("MOSFHET_MH_RANK") is not None:
        worker(nproc, int(os.environ["MOSFHET_MH_RANK"]),
               int(os.environ["MOSFHET_MH_PORT"]))
        return
    port = 12345 + (os.getpid() % 1000)
    procs = []
    for r in range(nproc):
        env = dict(os.environ)
        env["MOSFHET_MH_RANK"] = str(r)
        env["MOSFHET_MH_PORT"] = str(port)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(nproc)],
            env=env))
    rc = [p.wait() for p in procs]
    assert all(r == 0 for r in rc), f"worker exit codes {rc}"
    print(f"multihost dryrun OK: {nproc} processes")


if __name__ == "__main__":
    main()
