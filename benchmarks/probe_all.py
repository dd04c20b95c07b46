"""Hardware compile-probe for every fused-kernel entry point.

`tests/test_tpu_lowering.py` AOT-lowers kernels for TPU on CPU, which
catches python-side Mosaic classes (1-D gathers, i64 index maps) — but
layout/DMA-tiling rejections only surface in the REMOTE Mosaic compiler
(the round-3 `mxu_error` class).  This probe `.lower().compile()`s each
entry point at production geometry (TFHEPP_L2: N=2048, l=4, k=1) on the
real toolchain, no execution, and prints one JSON row per probe:

    {"probe": name, "ok": bool, "compile_s": float, "err": tail}

Run every round BEFORE the headline bench (measure_r4.sh).  Filter with
PROBE_ONLY=<substring>.  Also carries EXPERIMENTAL probes (prefix `x_`)
for patterns under consideration — currently the in-kernel static
lane-gather family that would let the GA Galois permutation fuse into
the stream keyswitch kernel (today it runs as 11 conditional XLA gathers
between two pallas_calls, `bootstrap_ga._permute_log`).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from mosfhet_tpu import ntt as _ntt                      # noqa: E402
from mosfhet_tpu.ops import pbs_kernel as pk             # noqa: E402

N, k, l, Bg_bit = 2048, 1, 4, 9          # TFHEPP_L2 kernel geometry
C = k + 1
J = C * l
B = pk.DEFAULT_BT

_rng = np.random.default_rng(7)


def _rand(shape, dtype=np.uint64, hi=None):
    hi = hi if hi is not None else np.iinfo(dtype).max
    return jnp.asarray(_rng.integers(0, hi, shape, dtype=np.int64
                                     if dtype == np.int32 else np.uint64)
                       .astype(dtype))


def _plan(mode: str):
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    if mode == "narrow":
        primes = _ntt.NARROW_PRIMES
    else:
        primes = _ntt.primes_for_bound(bound)
    return pk.get_kernel_plan(N, primes, l, Bg_bit, k,
                              mxu=("mxu" in mode),
                              rot_ntt=("rotntt" in mode))


def _key(kp, *lead):
    return _rand(lead + (C, kp.P, N), np.uint64,
                 hi=min(kp.primes)).astype(jnp.uint32)


def probe(name, fn, *args):
    only = os.environ.get("PROBE_ONLY")
    if only and only not in name:
        return
    t0 = time.time()
    try:
        if os.environ.get("PROBE_LOWER_ONLY") == "1":
            # python-side check only (no device): runs the Pallas->Mosaic
            # pipeline but not the remote Mosaic compiler
            jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
        else:
            jax.jit(fn).trace(*args).lower().compile()
        print(json.dumps({"probe": name, "ok": True,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    except Exception as e:
        msg = str(e)
        key = [ln for ln in msg.splitlines() if "Mosaic" in ln
               or "must be aligned" in ln or "NotImplemented" in ln
               or "Internal" in ln][:1]
        print(json.dumps({"probe": name, "ok": False,
                          "compile_s": round(time.time() - t0, 1),
                          "err": (key[0] if key else msg)[-200:]}),
              flush=True)


# --------------------------------------------------------------------------
# production entry points (mirror tests/test_tpu_lowering.py, real compile)
# --------------------------------------------------------------------------

def production_probes():
    for mode in ("default", "mxu", "narrow", "rotntt", "rotntt_mxu"):
        kp = _plan(mode)
        acc = _rand((B, C, N))
        a = _rand((2, B), np.int32, hi=2 * N)
        kv = _key(kp, 2, J)
        probe(f"blind_rotate_scan_{mode}",
              lambda acc, a, kv, kp=kp:
              pk.blind_rotate_scan(acc, a, kv, kv, kp), acc, a, kv)

    for mode in ("mxu",):
        kp = _plan(mode)
        acc = _rand((B, C, N))
        a = _rand((2, B), np.int32, hi=2 * N)
        kv = _key(kp, 2, J)
        probe(f"blind_rotate_scan_fused_{mode}",
              lambda acc, a, kv, kp=kp:
              pk.blind_rotate_scan_fused(acc, a, kv, kv, kp), acc, a, kv)

    for mode in ("default", "mxu"):
        kp = _plan(mode)
        rot = _rand((B, C, N))
        kv = _key(kp, J)
        probe(f"cmux_delta_{mode}",
              lambda rot, kv, kp=kp: pk.cmux_delta(rot, kv, kv, kp),
              rot, kv)

        acc = _rand((B, C, N))
        sa = _key(kp, 2, J)
        probe(f"ext_product_apply_scan_{mode}",
              lambda acc, sa, kp=kp: pk.ext_product_apply_scan(acc, sa, kp),
              acc, sa)

        G, M = 2, 4
        rotg = _rand((B, G, M), np.int32, hi=2 * N)
        su = _rand((kp.nl, G, M, J * C, N), np.uint64).astype(jnp.uint32)
        probe(f"unfolded_rotate_{mode}",
              lambda acc, rotg, su, kp=kp:
              pk.unfolded_rotate(acc, rotg, su, kp), acc, rotg, su)

        def p1(su, rotg, kp=kp, G=G):
            su_t = pk.tile_su_planes(su, kp)
            rot_t = pk.tile_rot(rotg, kp, G)
            return pk.ubr_phase1_combine(su_t, rot_t, kp)
        probe(f"ubr_phase1_combine_{mode}", p1, su, rotg)

        su5 = _rand((2, G, M, J * C, N), np.uint64).astype(jnp.uint32)
        rot5 = _rand((1, G, M), np.int32, hi=2 * N)
        probe(f"ubr_phase1_v2_{mode}",
              lambda su, rot, kp=kp: pk.ubr_phase1_combine_v2(su, rot, kp),
              su5, rot5)

        Jk = (C - 1) * l
        perm = _rand((B, C, N))
        rows = _rand((B, Jk, C, kp.P, N), np.uint64,
                     hi=min(kp.primes)).astype(jnp.uint32)
        probe(f"auto_keyswitch_{mode}",
              lambda p_, r_, kp=kp: pk.auto_keyswitch(p_, r_, kp),
              perm, rows)

        Gk = 4
        ak = _rand((Gk, Jk, C, kp.P, N), np.uint64,
                   hi=min(kp.primes)).astype(jnp.uint32)
        kidx = _rand((B,), np.int32, hi=Gk)
        probe(f"auto_keyswitch_stream_{mode}",
              lambda p_, a_, i_, kp=kp:
              pk.auto_keyswitch_stream(p_, a_, i_, kp), perm, ak, kidx)

        # whole-scan fused GA (ext product + permute + streamed auto-KS)
        acc_ga = _rand((B, C, N))
        gens = (_rand((2, B), np.int32, hi=N) * 2 + 1).astype(jnp.int32)
        sv = _key(kp, 2, J)
        akf = ak.reshape(Gk, Jk * C * kp.P, 1, N)
        import numpy as _np
        inv2n = jnp.asarray(_np.array(
            [pow(x, -1, 2 * N) for x in range(1, 2 * N, 2)], _np.int32))
        probe(f"ga_scan_fused_{mode}",
              lambda acc, g_, sv_, kp=kp: pk.ga_scan_fused(
                  acc, g_, sv_, sv_, akf, inv2n, kp, kp),
              acc_ga, gens, sv)

    for mode in ("default", "mxu", "rotntt_mxu"):
        kp = _plan(mode)
        j_local = J // 2
        acc = _rand((B, C, N))
        a_t = _rand((1, B, 1), np.int32, hi=2 * N)
        j0 = jnp.zeros((1,), jnp.int32)
        kv = _key(kp, j_local)

        def tp(acc, a_t, j0, kv, kp=kp):
            tiles = pk.split_limbs(acc, kp)
            spec = pk.partial_step_tiles(tiles, a_t, j0, kv, kv, kp)
            return pk.finish_step_tiles(tiles, spec, kp, n_parts=2)
        probe(f"tp_partial_finish_{mode}", tp, acc, a_t, j0, kv)

    t, base_m1, n_in, npad = 2, 3, 16, 128
    dig = _rand((B, n_in, t), np.int32, hi=base_m1 + 1)
    planes = tuple(_rand((n_in, t, base_m1, npad), np.uint64)
                   .astype(jnp.uint32) for _ in range(2))
    probe("tlwe_keyswitch_sum",
          lambda d, *p: pk.tlwe_keyswitch_sum(d, p), dig, *planes)


# --------------------------------------------------------------------------
# experimental probes: in-kernel Galois permutation (lane gathers)
# --------------------------------------------------------------------------

def _galois_idx(gen: int):
    """Static psi_gen table: out[j] = +-in[idx[j]] (negacyclic wrap)."""
    ginv = pow(gen, -1, 2 * N)
    j = np.arange(N)
    ic = (j * ginv) % (2 * N)
    return (ic % N).astype(np.int32), (ic >= N)


def _take_lanes(x, idx):
    """take_along_axis(axis=1) via lax.gather with int32 indices — the
    exact GatherDimensionNumbers Mosaic lowers to `tpu.dynamic_gather`
    (jnp.take_along_axis inserts an int64 index cast under x64, which
    Mosaic rejects)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        x, idx[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def x_gather_static():
    """One static full-lane permutation (a single psi_3 stage) applied to
    a [BT, N] u32 tile inside a kernel; index/sign tables as inputs."""
    idx, neg = _galois_idx(3)

    def kernel(x_ref, i_ref, n_ref, o_ref):
        x = x_ref[0]
        idx2 = jnp.broadcast_to(i_ref[0, 0][None, :], x.shape)
        g = _take_lanes(x, idx2)
        o_ref[0] = jnp.where(n_ref[0, 0][None, :] != 0,
                             jnp.uint32(0) - g, g)

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, B, N), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, 1, N), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, 1, N), lambda i: (i, i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((1, B, N), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((1, B, N), jnp.uint32),
    )
    x = _rand((1, B, N), np.uint64).astype(jnp.uint32)
    it = jnp.asarray(idx.reshape(1, 1, N))
    nt = jnp.asarray(neg.astype(np.uint32).reshape(1, 1, N))
    return lambda x, i, n: f(x, i, n), (x, it, nt)


def x_gather_dyn_rows():
    """Per-row dynamic lane gather — the `_permute_dyn` pattern entirely
    in-kernel: ONE tpu.dynamic_gather per [BT, N] tile would replace the
    11 conditional XLA gather stages of `bootstrap_ga._permute_log`.
    Indices are computed in-kernel from a per-row generator inverse
    (iota * ginv mod 2N), sign from bit N."""
    def kernel(x_ref, g_ref, o_ref):
        x = x_ref[0]
        ginv = g_ref[0]                                  # [BT, 1] i32
        j = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        ic = (j * ginv) & jnp.int32(2 * N - 1)
        g = _take_lanes(x, ic & jnp.int32(N - 1))
        o_ref[0] = jnp.where((ic & jnp.int32(N)) != 0,
                             jnp.uint32(0) - g, g)

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, B, N), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((1, B, 1), lambda i: (i, i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((1, B, N), lambda i: (i, i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((1, B, N), jnp.uint32),
    )
    x = _rand((1, B, N), np.uint64).astype(jnp.uint32)
    ginv = _rand((1, B, 1), np.int32, hi=2 * N) | jnp.int32(1)
    return lambda x, g: f(x, g), (x, ginv)


def experimental_probes():
    for name, mk in [("x_gather_static_lanes", x_gather_static),
                     ("x_gather_dyn_rows", x_gather_dyn_rows)]:
        try:
            fn, args = mk()
        except Exception as e:
            print(json.dumps({"probe": name, "ok": False,
                              "err": f"build: {str(e)[-160:]}"}),
                  flush=True)
            continue
        probe(name, fn, *args)


if __name__ == "__main__":
    if os.environ.get("PROBE_EXPERIMENTAL", "1") == "1":
        experimental_probes()
    if os.environ.get("PROBE_PRODUCTION", "1") == "1":
        production_probes()
