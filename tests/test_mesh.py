"""Multi-chip sharding correctness on the 8-device virtual CPU mesh.

The reference has no distribution (SURVEY.md §2.2); the mesh paths are this
framework's own headline claim, so they are proven here bit-exactly:

- data-sharded PBS == the unsharded single-device bootstrap (same bits),
- gadget-axis ("model") sharded PBS (per-step psum of partial external
  products, `parallel/mesh.py:_blind_rotate_tp`) == unsharded,
- the fused Pallas kernel path inside shard_map (interpreter mode),
  including a per-shard batch that is NOT a multiple of the kernel tile
  (exercises the in-`pbs_on_mesh` padding),
- and every output decrypts to the right LUT slot.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, rng, torus
from mosfhet_tpu.parallel import mesh as pmesh

P = params.TOY
KEY = jax.random.PRNGKey(4242)


def _setup(seed, batch, p=P):
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(KEY, seed), 5)
    key_tlwe = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
    bk = bootstrap.new_key(k2, gk, key_tlwe, 1)
    luts = rng.uniform_torus(k3, (4,))
    tv1 = trlwe.torus_packing(luts, p.k, p.N)
    slots = jnp.arange(batch) % 4
    ms = torus.double2torus(slots / 8.0)
    cs = tlwe.encrypt(ms, key_tlwe, k4)
    # batched test vector (the mesh path shards the leading batch axis)
    tv = trlwe.TRLWE(a=jnp.broadcast_to(tv1.a, (batch,) + tv1.a.shape),
                     b=jnp.broadcast_to(tv1.b, (batch,) + tv1.b.shape))
    return tv, tv1, cs, bk, key_out, luts, slots


def _phase_check(out, key_out, luts, slots, delta=1 << 58):
    ph = np.asarray(tlwe.phase(out, key_out), dtype=np.uint64)
    want = np.asarray(luts, dtype=np.uint64)[np.asarray(slots)]
    diff = np.abs((ph - want).view(np.int64).astype(np.float64))
    assert diff.max() <= delta, f"phase err 2^{np.log2(diff.max()+1):.1f}"


def test_data_sharded_bit_exact():
    """Pure data parallelism: shard batch over all 8 devices, replicate the
    key.  Bit-identical to the unsharded jnp bootstrap + decrypts."""
    batch = 16
    tv, tv1, cs, bk, key_out, luts, slots = _setup(0, batch)
    mesh = pmesh.make_mesh(jax.devices(), data=8, model=1)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis=None)
    got = run(tv, cs)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_model_sharded_bit_exact():
    """Gadget-axis (tensor-parallel analog) sharding: the bootstrap key's
    J=(k+1)l rows are split over `model`, partial products psum'd each CMUX
    step.  Must be bit-identical to the replicated-key path."""
    batch = 8
    tv, tv1, cs, bk, key_out, luts, slots = _setup(1, batch)
    mesh = pmesh.make_mesh(jax.devices(), data=4, model=2)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis="model")
    got = run(tv, cs)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_model_shard_4way():
    """4-way gadget sharding (J=8 rows, 2 per shard) on a 2x4 mesh."""
    batch = 4
    tv, tv1, cs, bk, key_out, luts, slots = _setup(2, batch)
    mesh = pmesh.make_mesh(jax.devices(), data=2, model=4)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis="model")
    got = run(tv, cs)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    _phase_check(got, key_out, luts, slots)


def test_dist_ntt_n_sharded():
    """Coefficient-sharded (N-sharded) negacyclic NTT over all 8 devices
    (`parallel/dist_ntt.py`): four-step factorization with one ppermute
    per cross-device butterfly stage.  Bit-exact vs the single-device
    `polynomial.ntt_mul_small` at N=16384 (beyond the reference's N<=8192
    envelope, `misc.c:147-158`)."""
    from mosfhet_tpu.parallel import dist_ntt
    from mosfhet_tpu import polynomial, ntt as _ntt
    from jax.sharding import Mesh
    N = 16384
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    run = dist_ntt.make_dist_ntt_mul_small(mesh, N, axis="x",
                                           max_abs_digit=256)
    rng_np = np.random.default_rng(7)
    d = jnp.asarray(rng_np.integers(-256, 257, size=N), jnp.int64)
    b = jnp.asarray(rng_np.integers(0, 1 << 64, size=N, dtype=np.uint64))
    with mesh:
        got = run(d, b)
    plan = _ntt.get_plan(N, _ntt.primes_for_bound(
        _ntt.conv_bound(N, 256, 1)))
    want = polynomial.ntt_mul_small(d, b, plan)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_kernel_model_sharded():
    """Kernel-speed gadget-axis sharding (`_blind_rotate_tp_kernel`):
    each CMUX step runs the partial-step kernel over this shard's J rows,
    psums the exact NTT-domain partials, and finishes in a second kernel.
    Must be bit-identical to the unsharded bootstrap (the partials are
    exact residues and `_inv_ntt` output is canonical)."""
    p = params.TFHEParams(
        n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
        lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="MESH_PALLAS_TP",
    )
    batch = 4                       # 2 data shards x 2 per shard (padded)
    tv, tv1, cs, bk, key_out, luts, slots = _setup(5, batch, p=p)
    mesh = pmesh.make_mesh(jax.devices()[:4], data=2, model=2)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis="model",
                            impl="pallas", interpret=True)
    got = run(tv, cs)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_pallas_kernel_model_sharded_mxu(monkeypatch):
    """The kernel-TP path under MOSFHET_NTT_MXU=1 (int8-matmul NTT tails
    in the partial kernel, MXU inverse head in the finish kernel) stays
    bit-identical to the unsharded bootstrap."""
    p = params.TFHEParams(
        n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
        lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="MESH_TP_MXU",
    )
    batch = 4
    tv, tv1, cs, bk, key_out, luts, slots = _setup(7, batch, p=p)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    monkeypatch.setenv("MOSFHET_NTT_MXU", "1")
    mesh = pmesh.make_mesh(jax.devices()[:4], data=2, model=2)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis="model",
                            impl="pallas", interpret=True)
    got = run(tv, cs)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_pallas_kernel_on_mesh_with_padding():
    """The fused kernel path inside shard_map (interpreter mode), with a
    per-shard batch (2) that is not a multiple of the kernel tile (32):
    `pbs_on_mesh` must pad/truncate internally and stay bit-exact."""
    p = params.TFHEParams(
        n=8, N=128, k=1, l=2, Bg_bit=10, t=6, base_bit=4,
        lwe_sigma=2.0**-28, rlwe_sigma=2.0**-44, name="MESH_PALLAS",
    )
    batch = 4                       # 2 devices x 2 per shard
    tv, tv1, cs, bk, key_out, luts, slots = _setup(3, batch, p=p)
    mesh = pmesh.make_mesh(jax.devices()[:2], data=2, model=1)
    run = pmesh.pbs_on_mesh(mesh, bk, torus_base=4, model_axis=None,
                            impl="pallas", interpret=True)
    got = run(tv, cs)
    want = bootstrap.functional_bootstrap(tv1, cs, bk, 4)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_dist_blind_rotate_bit_exact():
    """N-sharded blind rotate (`dist_ntt.make_dist_blind_rotate`): the
    CMUX scan with every polynomial coefficient-sharded over all 8
    devices must be BIT-identical to the single-chip rotation-free step
    (`bootstrap._cmux_step_rotntt`) at the same primes."""
    from jax.sharding import Mesh
    from mosfhet_tpu.parallel import dist_ntt
    from mosfhet_tpu import ntt as _ntt

    p = P
    tv, tv1, cs, bk, key_out, luts, slots = _setup(31, batch=4)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    prep_key, run = dist_ntt.make_dist_blind_rotate(
        mesh, p.N, p.k, p.l, p.Bg_bit, axis="x")
    kd = prep_key(bk)

    B = 4
    rng_np = np.random.default_rng(11)
    acc0 = jnp.asarray(rng_np.integers(
        0, 1 << 64, size=(B, p.k + 1, p.N), dtype=np.uint64))
    a_int = jnp.asarray(rng_np.integers(
        0, 2 * p.N + 1, size=(B, 6), dtype=np.int32))
    with mesh:
        got = run(acc0, a_int, kd[:6])

    # oracle: jnp rot-NTT scan with the same primes (the key's own)
    plan = bk.plan()
    keyv, keyvs = bk.v[:6], bk.vs[:6]

    def step(acc_st, xs):
        kv, kvs, ai = xs
        return bootstrap._cmux_step_rotntt(
            acc_st, kv, kvs, ai, plan, p.l, p.Bg_bit, p.k, p.N), None
    want, _ = jax.lax.scan(
        step, acc0, (keyv, keyvs, jnp.moveaxis(a_int, -1, 0)))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_dist_pbs_decrypts():
    """Full functional bootstrap with the blind rotate N-sharded over the
    8-device mesh decrypts every LUT slot."""
    from jax.sharding import Mesh
    from mosfhet_tpu.parallel import dist_ntt

    p = P
    tv, tv1, cs, bk, key_out, luts, slots = _setup(32, batch=4)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    prep_key, run = dist_ntt.make_dist_blind_rotate(
        mesh, p.N, p.k, p.l, p.Bg_bit, axis="x")
    kd = prep_key(bk)
    with mesh:
        out = dist_ntt.functional_bootstrap_n_sharded(
            mesh, tv1, cs, bk, kd, run, 4)
    _phase_check(out, key_out, luts, slots)


def test_unfolded_on_mesh_bit_exact():
    """Unfolded-BR bootstrap on the mesh (batch x 2^u-expansion TP):
    bit-identical to the single-device jnp unfolded bootstrap, and the
    model-sharded psum-of-u64-combines equals the replicated sum."""
    batch = 16
    tv, tv1, cs, bk, key_out, luts, slots = _setup(5, batch)
    k0, _ = jax.random.split(jax.random.fold_in(KEY, 50))
    key_tlwe = tlwe.new_binary_key(
        jax.random.split(jax.random.fold_in(KEY, 5), 5)[0],
        P.n, P.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(
        jax.random.split(jax.random.fold_in(KEY, 5), 5)[1],
        P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    bk2 = bootstrap.new_key(k0, gk, key_tlwe, 2)
    want = bootstrap.functional_bootstrap(tv1, cs, bk2, 4)
    for model in (1, 2, 4):
        mesh = pmesh.make_mesh(jax.devices(), data=8 // model, model=model)
        run = pmesh.unfolded_pbs_on_mesh(
            mesh, bk2, torus_base=4,
            model_axis="model" if model > 1 else None)
        got = run(tv, cs)
        np.testing.assert_array_equal(np.asarray(got.a),
                                      np.asarray(want.a))
        np.testing.assert_array_equal(np.asarray(got.b),
                                      np.asarray(want.b))
    _phase_check(got, key_out, luts, slots)


def test_ga_on_mesh_bit_exact():
    """GA bootstrap on the mesh (batch x row-TP for both the external
    product and the automorphism keyswitch): bit-identical to the
    single-device jnp GA bootstrap."""
    from mosfhet_tpu import bootstrap_ga
    batch = 16
    tv, tv1, cs, bk, key_out, luts, slots = _setup(6, batch)
    ks5 = jax.random.split(jax.random.fold_in(KEY, 6), 5)
    key_tlwe = tlwe.new_binary_key(ks5[0], P.n, P.lwe_sigma)
    key_trlwe = trlwe.new_binary_key(ks5[1], P.N, P.k, P.rlwe_sigma)
    gk = trgsw.new_key(key_trlwe, P.l, P.Bg_bit)
    bkg = bootstrap_ga.new_key(jax.random.fold_in(KEY, 60), gk, key_tlwe)
    want = bootstrap_ga.functional_bootstrap_ga(tv1, cs, bkg, 4)
    for model in (1, 2):
        mesh = pmesh.make_mesh(jax.devices(), data=8 // model, model=model)
        run = pmesh.ga_pbs_on_mesh(
            mesh, bkg, torus_base=4,
            model_axis="model" if model > 1 else None)
        got = run(tv, cs)
        np.testing.assert_array_equal(np.asarray(got.a),
                                      np.asarray(want.a))
        np.testing.assert_array_equal(np.asarray(got.b),
                                      np.asarray(want.b))
