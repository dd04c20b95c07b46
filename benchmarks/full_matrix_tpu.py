"""Full-scale parameter pass/fail matrix at the reference's NATIVE
parameters, on real TPU.

The CI matrix (tests/test_param_matrix.py) runs scaled sets; this runs the
same op family at SET_1/2/3 + TFHEPP_L2 exactly as the reference's
`tests.c:36-63` defines them, one jitted program per op.  The SET_2 column
should reproduce the reference's measured 31/41 behavior: tlwe_mul,
trgsw_mul, registers, circuit bootstrap, FDFB KS21/CLOT21 and the TRGSW
bootstrap fail under l=1 / Bg=23; PBS and fdfb_this_work pass
(BASELINE.md, reference README:83).

Memory discipline (one 16 GiB chip): the packing1 / priv-SK tables are
7.5-9.4 GiB dense at L2/SET_3, so those sets use seeded keys (half size)
with the streamed expand-on-select apply — and even seeded, the two keys
only coexist for the one op that needs both (circuit bootstrap v1); each
is deleted the moment its last op ran.  Every op is individually guarded
so an OOM reports that op and moves on, and each parameter set runs in
its own subprocess so a wedged TPU client cannot poison the next set.

Prints one JSON line per (set, op): {"set", "op", "ok", "detail"}.
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


def _err(want, got):
    d = np.abs(np.asarray(
        jnp.asarray(got, jnp.uint64) - jnp.asarray(want, jnp.uint64)
    ).view(np.int64).astype(np.float64))
    return float(d.max())


ALL_OPS = ("pbs", "trgsw_mul", "trgsw_reg_sub", "trgsw_bootstrap",
           "fdfb_this_work", "priv_ks", "tlwe_mul", "fdfb_ks21",
           "fdfb_clot21", "circuit_bootstrap", "ga_bootstrap")

# --- reference ground truth (MEASURED, benchmarks/ref_suite_r5/: the
# reference's own Unity suite compiled per set, AVX-512 SPQLIOS + VAES,
# this machine).  Mapping of our matrix ops to reference test names:
# pbs=test_functional_bootstrap, trgsw_mul=test_trgsw_mul,
# trgsw_reg_sub=test_trgsw_reg_sub,
# trgsw_bootstrap=test_functional_bootstrap_trgsw,
# fdfb_this_work=test_FDFB_new, priv_ks=test_trlwe_pack_key_priv_ks,
# tlwe_mul=test_tlwe_mul, fdfb_ks21=test_FDFB_KS21,
# fdfb_clot21=test_FDFB_CLOT21, circuit_bootstrap=test_circuit_bootstrap,
# ga_bootstrap=test_functional_bootstrap_ga.
# True = reference passes at that set.
REF_EXPECTED = {
    #                 SET_1  SET_2  SET_3  TFHEPP_L2
    "pbs":               {"SET_1": True, "SET_2": True, "SET_3": True,
                          "TFHEPP_L2": True},
    "trgsw_mul":         {"SET_1": True, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "trgsw_reg_sub":     {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "trgsw_bootstrap":   {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "fdfb_this_work":    {"SET_1": False, "SET_2": True, "SET_3": True,
                          "TFHEPP_L2": True},
    "priv_ks":           {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "tlwe_mul":          {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "fdfb_ks21":         {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "fdfb_clot21":       {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "circuit_bootstrap": {"SET_1": False, "SET_2": False, "SET_3": False,
                          "TFHEPP_L2": True},
    "ga_bootstrap":      {"SET_1": False, "SET_2": True, "SET_3": True,
                          "TFHEPP_L2": True},
}
# Cells at the noise edge where single runs flip between pass and fail
# (measured: SET_1 test_tlwe_mul passed 1 of 4 reference runs —
# ref_suite_r5/SET_1.log + three re-runs; SET_1 ga_bootstrap on OUR side
# measured 2^61.8 fail and 2^56.2 pass across two hardware runs vs the
# 2^59 threshold — the exact CRT-NTT's ~2-bit noise edge over the
# reference's f64 FFT puts us exactly at the envelope boundary where the
# reference consistently fails): directional parity cannot be asserted
# from one run on either side.
# (SET_2 trgsw_bootstrap likewise flips on our side: 2^59.5 fail in the
# round-4 run vs 2^58.0 pass in round 5, threshold 2^59.)
MARGINAL = {("SET_1", "tlwe_mul"), ("SET_1", "ga_bootstrap"),
            ("SET_2", "trgsw_bootstrap")}
# Cells where we pass and the reference fails BECAUSE the exact CRT-NTT
# removes the reference's ~2^-40 f64 FFT transform noise (analyzed in
# BASELINE.md round-3 parity table) — a justified divergence in our favor.
EXACT_NTT_ADVANTAGE = {("SET_1", "trgsw_reg_sub"), ("SET_1",
                                                    "fdfb_this_work")}


def match_field(set_name: str, op: str, ok: bool):
    """Per-cell parity verdict vs the measured reference behavior:
    "yes" (same outcome), "ours_better" (we pass, reference fails, known
    exact-NTT cause), "marginal" (reference outcome flips run-to-run),
    "NO" (unexplained divergence), or None (no ground-truth cell)."""
    exp = REF_EXPECTED.get(op, {}).get(set_name)
    if exp is None:
        return None
    if (set_name, op) in MARGINAL:
        return "marginal"
    if ok == exp:
        return "yes"
    if ok and not exp and (set_name, op) in EXACT_NTT_ADVANTAGE:
        return "ours_better"
    return "NO"

# op groups for MATRIX_PER_OP mode: the two HBM giants get a fresh
# process (and skip the keygens their ops don't need)
OP_GROUPS = (
    "pbs,trgsw_mul,trgsw_reg_sub,trgsw_bootstrap,fdfb_this_work,priv_ks",
    "tlwe_mul,fdfb_ks21,fdfb_clot21",
    "circuit_bootstrap",
    "ga_bootstrap",
)


def run_set(set_name, emit, ops=None):
    from mosfhet_tpu import (params, tlwe, trlwe, trgsw, bootstrap,
                             bootstrap_ga, keyswitch as ks, product, rng,
                             torus)
    ops = set(ops) if ops else set(ALL_OPS)

    def needed(*names):
        return any(o in ops for o in names)

    p = params.get_params(set_name)
    KEY = jax.random.PRNGKey(20260817)
    # deterministic per-set fold: python's hash() of a str is randomized
    # per process (PYTHONHASHSEED), which made marginal cells flip
    # between runs (round-5 finding: SET_1 ga_bootstrap measured 2^61.8
    # fail and 2^56.2 pass on different days purely from the seed)
    set_fold = sum(set_name.encode()) % 97
    kk = jax.random.split(jax.random.fold_in(KEY, set_fold), 10)
    t0 = time.time()
    # Base keygen is guarded too: the r3 run aborted with a bare
    # RESOURCE_EXHAUSTED and zero rows, so every failure must name its step
    # and rows must stream out as they are produced.  Keys are generated
    # only when a requested op needs them (per-op children keep a minimal
    # footprint).
    try:
        key_tlwe = tlwe.new_binary_key(kk[0], p.n, p.lwe_sigma)
        key_trlwe = trlwe.new_binary_key(kk[1], p.N, p.k, p.rlwe_sigma)
        key_out = trlwe.extract_tlwe_key(key_trlwe)
        gk = trgsw.new_key(key_trlwe, p.l, p.Bg_bit)
        bk = None
        if needed("pbs", "trgsw_bootstrap", "fdfb_this_work", "tlwe_mul",
                  "fdfb_ks21", "fdfb_clot21", "circuit_bootstrap"):
            bk = jax.jit(lambda r, k_: bootstrap.new_key(r, gk, k_, 1))(
                kk[2], key_tlwe)
            jax.block_until_ready(bk.v)
        rlk = None
        if needed("tlwe_mul", "fdfb_clot21"):
            rlk = jax.jit(lambda r, k_: ks.new_rl_key(r, k_, 2, 20))(
                kk[5], key_trlwe)
            jax.block_until_ready(rlk.v)
    except Exception as ex:
        emit({"set": set_name, "op": "__setup__", "ok": False,
              "detail": f"base keygen: {type(ex).__name__}: {ex}"[:160]})
        return

    def try_key(name, fn):
        try:
            v = fn()
            jax.block_until_ready(jax.tree.leaves(v)[0])
            return v
        except Exception as ex:
            log(f"# {set_name}: {name} keygen failed "
                f"({type(ex).__name__}) — dependent ops skipped")
            return None

    tksk = None
    if needed("fdfb_this_work"):
        tksk = try_key("tlwe_ks", lambda: jax.jit(
            lambda r, a, b: tlwe.new_ks_key(
                r, a, b, p.t, p.base_bit))(kk[9], key_tlwe, key_out))
    tab_bytes = (p.k * p.N) * p.t * ((1 << p.base_bit) - 1) \
        * (p.k + 1) * p.N * 8
    big_keys = tab_bytes > 6 << 30
    if big_keys:
        log(f"# {set_name}: packing1/priv_sk dense tables "
            f"{tab_bytes/2**30:.1f} GiB > HBM — seeded keys with "
            f"streamed (expand-on-select) apply, staged lifetimes")

    def gen_ksk1():
        if big_keys:
            return try_key("packing1_seeded", lambda: jax.jit(
                lambda r, ok, ik: ks.new_packing1_ks_key_seeded(
                    r, ok, ik, p.t, p.base_bit))(kk[6], key_trlwe,
                                                 key_out))
        return try_key("packing1", lambda: jax.jit(
            lambda r, ok, ik: ks.new_packing1_ks_key(
                r, ok, ik, p.t, p.base_bit))(kk[6], key_trlwe, key_out))

    def gen_kska():
        if big_keys:
            return try_key("priv_sk_seeded", lambda: jax.jit(
                lambda r, ok, ik: ks.new_priv_sk_ks_key_seeded(
                    r, ok, ik, p.t, p.base_bit))(kk[7], key_trlwe,
                                                 key_out))
        return try_key("priv_sk", lambda: jax.jit(
            lambda r, ok, ik: ks.new_priv_sk_ks_key(
                r, ok, ik, p.t, p.base_bit))(kk[7], key_trlwe, key_out))

    log(f"# {set_name}: base keys {time.time()-t0:.0f}s")

    def report(op, ok, detail):
        emit({"set": set_name, "op": op, "ok": bool(ok),
              "detail": detail, "match": match_field(set_name, op, bool(ok))})
        log(f"# {set_name:10s} {op:22s} {'pass' if ok else 'FAIL'} "
            f"({detail})")

    def guarded(op, fn):
        """Run one op; an exception (incl. OOM) reports FAIL and moves
        on instead of aborting the set.  Skips ops outside the child's
        MATRIX_OPS filter."""
        if op not in ops:
            return
        try:
            fn()
        except AssertionError as ex:
            # deliberate key>HBM style guards: an execution-path fact
            report(op, False, f"{type(ex).__name__}: {ex}"[:80])
        except Exception as ex:
            # infra failure (OOM, Mosaic, tunnel): NOT a noise outcome —
            # never allowed to masquerade as reference parity
            emit({"set": set_name, "op": op, "ok": False,
                  "detail": f"{type(ex).__name__}: {ex}"[:80],
                  "match": "infra"})
            log(f"# {set_name:10s} {op:22s} INFRA-FAIL "
                f"({type(ex).__name__})")
        import gc
        gc.collect()

    luts = rng.uniform_torus(kk[3], (4,))
    tv = trlwe.torus_packing(luts, p.k, p.N)
    ms = torus.double2torus(jnp.arange(4) / 8.0)
    cs = jax.jit(lambda m, r: tlwe.encrypt(m, key_tlwe, r))(ms, kk[4])

    # ---- ops needing no multi-GiB KS keys -------------------------------

    def op_pbs():
        out = jax.jit(lambda tv, c, bk: bootstrap.functional_bootstrap(
            tv, c, bk, 4))(tv, cs, bk)
        e = _err(luts, tlwe.phase(out, key_out))
        report("pbs", e <= 2.0**58, f"2^{math.log2(e+1):.1f}")
    guarded("pbs", op_pbs)

    def op_trgsw_mul():
        g1 = trgsw.monomial_encrypt(1, 5, gk, jax.random.fold_in(KEY, 13))
        g2 = trgsw.monomial_encrypt(1, 3, gk, jax.random.fold_in(KEY, 14))
        prod = jax.jit(lambda a, b: trgsw.mul_trgsw_dft(
            a, trgsw.to_dft(b, gk.plan())))(g1, g2)
        eexp = int(jax.jit(lambda g: trgsw.debug_decrypt_exp_dft(
            g, gk))(prod))
        report("trgsw_mul", eexp == 8, f"exp {eexp}")
    guarded("trgsw_mul", op_trgsw_mul)

    def op_reg_sub():
        r1 = trgsw.reg_encrypt(9, gk, jax.random.fold_in(KEY, 15))
        r2 = trgsw.reg_encrypt(4, gk, jax.random.fold_in(KEY, 16))
        rs = jax.jit(trgsw.reg_sub)(r1, r2)
        eexp = int(jax.jit(lambda g: trgsw.debug_decrypt_exp_dft(g, gk))(
            rs.positive))
        report("trgsw_reg_sub", eexp == 5, f"exp {eexp}")
    guarded("trgsw_reg_sub", op_reg_sub)

    def op_trgsw_bootstrap():
        cm = tlwe.encrypt(torus.double2torus(2 / 8.0), key_tlwe,
                          jax.random.fold_in(KEY, 26))

        def tb_fn(c, bk, tv):
            g = bootstrap.functional_bootstrap_trgsw_phase1(
                c, bk, 4, p.l, p.Bg_bit)
            return bootstrap.functional_bootstrap_trgsw_phase2(g, tv)
        out = jax.jit(tb_fn)(cm, bk, tv)
        e = _err(luts[2], tlwe.phase(out, key_out))
        report("trgsw_bootstrap", e <= 2.0**59, f"2^{math.log2(e+1):.1f}")
    guarded("trgsw_bootstrap", op_trgsw_bootstrap)

    def op_fdfb_this_work():
        luts8b = rng.uniform_torus(jax.random.fold_in(KEY, 24), (8,))
        tvm = trlwe.torus_packing_many_lut(luts8b, 4, 2, p.k, p.N)
        cm = tlwe.encrypt(torus.int2torus(jnp.uint64(6), 3), key_tlwe,
                          jax.random.fold_in(KEY, 25))
        assert tksk is not None, "tlwe KS key > HBM"
        out = jax.jit(lambda tv, c, bk, k_: bootstrap.fdfb_this_work(
            tv, c, bk, k_, 3))(tvm, cm, bk, tksk)
        e = _err(luts8b[6], tlwe.phase(out, key_out))
        report("fdfb_this_work", e <= 2.0**58, f"2^{math.log2(e+1):.1f}")
    guarded("fdfb_this_work", op_fdfb_this_work)
    del tksk  # last use — free ~1.2 GiB before the packing1 table arrives

    def op_priv_ks():
        from mosfhet_tpu import polynomial as poly
        pair = try_key("priv_pair", lambda: jax.jit(
            lambda r, a, b: ks.new_priv_ks_key_pair(
                r, a, b, p.t, p.base_bit))(kk[8], key_trlwe, key_trlwe))
        assert pair is not None, "priv pair key > HBM"
        mm = rng.uniform_torus(jax.random.fold_in(KEY, 27), (p.N,))
        cc = trlwe.encrypt(mm, key_trlwe, jax.random.fold_in(KEY, 28))
        out = jax.jit(ks.priv_keyswitch_2)(cc, pair)
        want = (jnp.uint64(0) - poly.ntt_mul_small(
            jnp.asarray(key_trlwe.s[0], jnp.int32), mm,
            key_trlwe.plan()))
        e = _err(want, trlwe.phase(out, key_trlwe))
        report("priv_ks", e <= 2.0**50, f"2^{math.log2(e+1):.1f}")
    guarded("priv_ks", op_priv_ks)

    # ---- ops needing the packing1 table (generated once, freed last) ----
    ksk1 = gen_ksk1() if needed("tlwe_mul", "fdfb_ks21", "fdfb_clot21",
                                "circuit_bootstrap") else None

    def op_tlwe_mul():
        in1, in2 = 5, 11
        c1 = tlwe.encrypt(torus.int2torus(jnp.uint64(in1), 4), key_out,
                          jax.random.fold_in(KEY, 11))
        c2 = tlwe.encrypt(torus.int2torus(jnp.uint64(in2), 4), key_out,
                          jax.random.fold_in(KEY, 12))
        assert ksk1 is not None, "packing1 key > HBM"
        om = jax.jit(lambda a, b, k1, k2: product.tlwe_mul(
            a, b, 4, k1, k2))(c1, c2, ksk1, rlk)
        res = int(torus.torus2int(tlwe.phase(om, key_out), 4)) % 16
        report("tlwe_mul", res == (in1 * in2) % 16, f"digit {res}")
    guarded("tlwe_mul", op_tlwe_mul)

    def op_fdfb_ks21():
        luts8 = rng.uniform_torus(jax.random.fold_in(KEY, 20), (8,))
        tvp = jnp.repeat(luts8, (2 * p.N) // 8)
        cm = tlwe.encrypt(torus.int2torus(jnp.uint64(5), 3), key_tlwe,
                          jax.random.fold_in(KEY, 21))
        assert ksk1 is not None, "packing1 key > HBM"
        out = jax.jit(lambda tvp, c, bk, k_: bootstrap.fdfb_ks21(
            tvp, c, bk, k_, 8))(tvp, cm, bk, ksk1)
        e = _err(luts8[5], tlwe.phase(out, key_out))
        report("fdfb_ks21", e <= 2.0**58, f"2^{math.log2(e+1):.1f}")
    guarded("fdfb_ks21", op_fdfb_ks21)

    def op_fdfb_clot21():
        lutsq = torus.int2torus(
            rng.uniform_torus(jax.random.fold_in(KEY, 22), (8,))
            & jnp.uint64(15), 4)
        tv0 = trlwe.torus_packing(lutsq[:4], p.k, p.N)
        tv1 = trlwe.torus_packing(lutsq[4:], p.k, p.N)
        cm = tlwe.encrypt(torus.int2torus(jnp.uint64(6), 3), key_tlwe,
                          jax.random.fold_in(KEY, 23))
        assert ksk1 is not None, "packing1 key > HBM"
        out = jax.jit(lambda a, b, c, bk, k1, k2: bootstrap.fdfb_clot21(
            a, b, c, bk, k1, k2, 4))(tv0, tv1, cm, bk, ksk1, rlk)
        e = _err(lutsq[6], tlwe.phase(out, key_out))
        report("fdfb_clot21", e <= 2.0**59, f"2^{math.log2(e+1):.1f}")
    guarded("fdfb_clot21", op_fdfb_clot21)
    del rlk  # last use — free before priv-SK joins packing1 in HBM

    # ---- circuit bootstrap: the ONE op needing packing1 + priv-SK at
    # once (`bootstrap.c:309-322`) — generate priv-SK last, free both
    # immediately after
    kska = gen_kska() if needed("circuit_bootstrap") else None

    def op_circuit_bootstrap():
        m0 = rng.uniform_torus(jax.random.fold_in(KEY, 17), (p.N,))
        ctrl = trlwe.encrypt(m0, key_trlwe, jax.random.fold_in(KEY, 18))
        cb = tlwe.encrypt(torus.double2torus(1 / 4.0), key_tlwe,
                          jax.random.fold_in(KEY, 19))

        def cb_fn(c, bk, kska, kskb, ctrl):
            g = bootstrap.circuit_bootstrap(c, bk, kska, kskb, p.l,
                                            p.Bg_bit)
            return trgsw.external_product(ctrl, trgsw.to_dft(g, gk.plan()))
        assert kska is not None and ksk1 is not None, "KS keys > HBM"
        out = jax.jit(cb_fn)(cb, bk, kska, ksk1, ctrl)
        e = _err(m0, trlwe.phase(out, key_trlwe))
        report("circuit_bootstrap", e <= 2.0**59,
               f"2^{math.log2(e+1):.1f}")
    guarded("circuit_bootstrap", op_circuit_bootstrap)
    del kska, ksk1

    # ---- GA bootstrap (envelope: n < 2N/torus_base) ---------------------
    def op_ga():
        bkg = jax.jit(lambda r, k_: bootstrap_ga.new_key(r, gk, k_))(
            jax.random.fold_in(KEY, 29), key_tlwe)
        jax.block_until_ready(bkg.ak_v)
        cm = tlwe.encrypt(torus.double2torus(3 / 8.0), key_tlwe,
                          jax.random.fold_in(KEY, 30))
        out = jax.jit(
            lambda tv, c, bk: bootstrap_ga.functional_bootstrap_ga(
                tv, c, bk, 4))(tv, cm, bkg)
        e = _err(luts[3], tlwe.phase(out, key_out))
        report("ga_bootstrap", e <= 2.0**59, f"2^{math.log2(e+1):.1f}")
    guarded("ga_bootstrap", op_ga)


def main():
    child = os.environ.get("MATRIX_CHILD")
    if child:
        opsl = os.environ.get("MATRIX_OPS")
        run_set(child, lambda r: print(json.dumps(r), flush=True),
                ops=opsl.split(",") if opsl else None)
        return

    # parent: one subprocess per set (sequential — the axon tunnel serves
    # one client at a time; the parent never creates one), so an OOM-
    # wedged client in one set cannot poison the next
    import subprocess
    sets = os.environ.get("MATRIX_SETS", "SET_1,SET_2,SET_3,TFHEPP_L2")
    tmo = int(os.environ.get("MATRIX_SET_TIMEOUT", "7000"))
    per_op = os.environ.get("MATRIX_PER_OP") == "1"
    only = os.environ.get("MATRIX_ONLY_OPS")   # csv filter on op names
    only_set = set(only.split(",")) if only else None
    jobs = []
    for s in sets.split(","):
        if per_op:
            for g in OP_GROUPS:
                gset = set(g.split(","))
                if only_set is not None:
                    gset &= only_set
                    if not gset:
                        continue
                jobs.append((s, ",".join(sorted(gset))))
        else:
            jobs.append((s, None))
    for s, grp in jobs:
        env = dict(os.environ, MATRIX_CHILD=s)
        if grp:
            env["MATRIX_OPS"] = grp
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=tmo)
            out, errtxt, rc = r.stdout, r.stderr, r.returncode
        except subprocess.TimeoutExpired as te:
            # salvage the rows the child streamed before the timeout
            # (POSIX attaches these as bytes regardless of text=True)
            def _txt(b):
                return b.decode(errors="replace") if isinstance(b, bytes) \
                    else (b or "")
            out, errtxt = _txt(te.stdout), _txt(te.stderr)
            rc = f"timeout {tmo}s"
        sys.stderr.write(errtxt or "")
        got = [json.loads(x) for x in (out or "").splitlines()
               if x.startswith("{")]
        if not got:
            got = [{"set": s, "op": "__aborted__", "ok": False,
                    "detail": f"exit {rc}: "
                              f"{(errtxt or '').strip()[-120:]}"}]
        elif not isinstance(rc, int) or rc != 0:
            got.append({"set": s, "op": "__truncated__", "ok": False,
                        "detail": f"exit {rc}: "
                                  f"{(errtxt or '').strip()[-120:]}"})
        for row in got:
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
