"""Analytic roofline / MFU accounting for the fused TFHE kernels.

The reference frames cost as FFT counts (`test/benchmark_arith.c`,
SURVEY §3.1: n·((k+1)l fwd + (k+1) inv) transforms per bootstrap); on TPU
the honest version of that cost model is *resource* counts: VPU integer
ops, MXU int8 MACs, and HBM bytes moved.  Rather than hand-maintaining
per-stage coefficients, this module counts primitives in the ACTUAL
traced program: `jax.make_jaxpr` of the jitted op, recursing into
`scan` bodies (×trip count), `pallas_call` kernels (×grid size), `cond`
branches (max), and nested `pjit`s.  The counts are therefore exact for
elementwise work (every `mul`/`add`/`select_n`/`roll`... on a [BT, N]
tile counts its true element count) and for MXU contractions
(`dot_general` MAC count from its dimension numbers).

HBM traffic is modeled as the pipelined-DMA volume of every
`pallas_call`: each grid step fetches its input blocks and writes its
output blocks (Mosaic double-buffers but does not dedupe across grid
steps), plus XLA scan carries.  Block volumes are summed per grid step —
an upper bound that matches how the Mosaic pipeline actually streams.

Peak numbers (one TPU v5e chip, public specs):
  - bf16 matmul 197 TFLOP/s and int8 394 TOP/s => 4 MXUs of 128x128 at
    1.5 GHz (cross-checked: v5p's 8 MXUs at its known 1.75 GHz give its
    459 TFLOP/s); int8 peak = 197e12 MAC/s.
  - VPU: 4 ALU slots x (8 sublanes x 128 lanes) per cycle at the same
    1.5 GHz => 6.14e12 elementwise int32 op/s.  (32-bit multiplies are
    counted as one op; `_mulhi32` decomposes 32x32->64 into four 16-bit
    partials, so the counts below already reflect the real multiply
    amplification.)
  - HBM: 16 GiB at 819 GB/s.

MFU here = (resource count / peak) / measured time — the fraction of the
chip's speed-of-light the kernel achieves on its *binding* resource.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np

# one v5e chip
V5E_VPU_OPS = 4 * 8 * 128 * 1.5e9       # 6.14e12 elementwise op/s
V5E_MXU_I8_MACS = 197e12                # int8 MAC/s (394 TOPs / 2)
V5E_HBM_BPS = 819e9                     # bytes/s

# elementwise primitives costed at 1 op per output element
_ELEMENTWISE = {
    "add", "sub", "mul", "neg", "not", "and", "or", "xor",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "lt", "le", "gt", "ge", "eq", "ne", "min", "max", "rem", "div",
    "select_n", "convert_element_type", "clamp", "sign", "abs",
    "roll",                       # pltpu.roll: one vector-shift op
    "dynamic_gather",             # tpu.dynamic_gather: one op/elem
    "gather",                     # lowers to dynamic_gather on lanes
    "population_count", "clz", "integer_pow",
}
# pure layout / free
_FREE = {
    "broadcast_in_dim", "reshape", "concatenate", "slice", "squeeze",
    "transpose", "iota", "rev", "get", "swap", "copy", "pad",
    "dynamic_slice", "dynamic_update_slice", "bitcast_convert_type",
    "stop_gradient", "masked_load", "masked_store", "program_id",
    "num_programs", "reduce_sum", "reduce_max", "reduce_min",
    "reduce_and", "reduce_or", "argmax", "argmin", "expand_dims",
}


@dataclasses.dataclass
class Counts:
    vpu_ops: float = 0.0
    mxu_macs: float = 0.0
    hbm_bytes: float = 0.0

    def __add__(self, o):
        return Counts(self.vpu_ops + o.vpu_ops, self.mxu_macs + o.mxu_macs,
                      self.hbm_bytes + o.hbm_bytes)

    def __mul__(self, k):
        return Counts(self.vpu_ops * k, self.mxu_macs * k,
                      self.hbm_bytes * k)


def _out_elems(eqn):
    return sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
               if hasattr(v.aval, "shape"))


def _dot_macs(eqn):
    d = eqn.params["dimension_numbers"]
    (lc, _rc), (lb, _rb) = d
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = int(np.prod([lhs[i] for i in lb])) if lb else 1
    k = int(np.prod([lhs[i] for i in lc]))
    m = int(np.prod([s for i, s in enumerate(lhs)
                     if i not in lc and i not in lb]))
    n = int(np.prod([s for i, s in enumerate(rhs)
                     if i not in d[0][1] and i not in d[1][1]]))
    return float(batch * m * n * k)


def _fetch_count(bm, grid):
    """Number of block fetches for one operand: the Mosaic pipeline
    re-fetches a block only when its index-map output changes, so count
    the product of grid extents the index map actually VARIES with
    (evaluated at basis points; exact for the affine/broadcast maps used
    here).  Revisited blocks (constant along a grid dim) are fetched
    once per outer change — e.g. the fused-scan accumulator is charged
    per batch tile, not per step."""
    import jax.core as jcore
    imj = getattr(bm, "index_map_jaxpr", None)
    if imj is None or not grid:
        return int(np.prod(grid)) if grid else 1

    def ev(pt):
        return tuple(
            int(x) for x in jcore.eval_jaxpr(
                imj.jaxpr, imj.consts,
                *[np.int32(v) for v in pt]))
    try:
        base = ev((0,) * len(grid))
        # the pipeline re-fetches when the index CHANGES between
        # consecutive (lexicographic) grid steps: a block varying with
        # dim d* (the innermost varying dim) is fetched once per step of
        # every dim up to and including d* — outer iterations reset the
        # inner variation even for outer dims the map ignores
        d_star = -1
        for d, g in enumerate(grid):
            if g <= 1:
                continue
            pt = [0] * len(grid)
            pt[d] = 1
            if ev(tuple(pt)) != base:
                d_star = d
        if d_star < 0:
            return 1
        return int(np.prod(grid[:d_star + 1]))
    except Exception:
        return int(np.prod(grid))


def _pallas_hbm_bytes(eqn):
    gm = eqn.params["grid_mapping"]
    grid = [int(g) for g in gm.grid] if gm.grid else []
    total = 0.0
    avals = [v.aval for v in eqn.invars] + list(eqn.params["out_avals"])
    for bm, aval in zip(gm.block_mappings, avals):
        if bm is None:
            continue
        try:
            blk = 1
            for b in bm.block_shape:
                bs = getattr(b, "block_size", b)
                try:
                    blk *= int(bs) if bs is not None else 1
                except (TypeError, ValueError):
                    blk *= 1          # Squeezed() entries: extent 1
            total += blk * aval.dtype.itemsize * _fetch_count(bm, grid)
        except Exception:
            total += int(np.prod(aval.shape)) * aval.dtype.itemsize \
                * (int(np.prod(grid)) if grid else 1)
    return float(total)


def _while_trip_count(eqn) -> int:
    """Static trip count of a `fori_loop`-shaped while: carry starts with
    literal (lower, upper) counters and the cond is `lt(carry_i, carry_j)`.
    Raises for genuinely dynamic loops (none exist in the production
    kernels)."""
    cj = eqn.params["cond_jaxpr"].jaxpr
    nc = eqn.params["cond_nconsts"] + eqn.params["body_nconsts"]
    carry = eqn.invars[nc:]
    if len(cj.eqns) == 1 and cj.eqns[0].primitive.name == "lt":
        a, b = cj.eqns[0].invars
        try:
            ia = cj.invars.index(a)
            ib = cj.invars.index(b)
            lo = int(carry[ia].val)
            hi = int(carry[ib].val)
            return max(hi - lo, 0)
        except (ValueError, AttributeError, TypeError):
            pass
    raise ValueError("while_loop has no extractable static trip count; "
                     "roofline counting requires fori/scan-style loops")


def count_jaxpr(jaxpr) -> Counts:
    """Recursively count resource usage of a (Closed)Jaxpr."""
    jx = getattr(jaxpr, "jaxpr", jaxpr)
    c = Counts()
    for eqn in jx.eqns:
        name = eqn.primitive.name
        if name == "scan":
            body = count_jaxpr(eqn.params["jaxpr"])
            length = int(eqn.params["length"])
            c = c + body * length
            # scan carries round-trip HBM once per step (XLA keeps them
            # in HBM between loop iterations at these sizes)
            ncar = eqn.params["num_carry"]
            ncon = eqn.params["num_consts"]
            car_bytes = sum(
                int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                for v in eqn.invars[ncon:ncon + ncar])
            c.hbm_bytes += 2.0 * car_bytes * length
        elif name == "pallas_call":
            body = count_jaxpr(eqn.params["jaxpr"])
            gm = eqn.params["grid_mapping"]
            grid = int(np.prod([int(g) for g in gm.grid])) if gm.grid else 1
            c = c + body * grid
            c.hbm_bytes += _pallas_hbm_bytes(eqn)
        elif name in ("pjit", "closed_call", "core_call", "remat",
                      "checkpoint", "custom_jvp_call", "custom_vjp_call"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                c = c + count_jaxpr(inner)
        elif name == "cond":
            c = c + max((count_jaxpr(b) for b in eqn.params["branches"]),
                        key=lambda x: x.vpu_ops)
        elif name == "while":
            c = c + count_jaxpr(eqn.params["body_jaxpr"]) \
                * _while_trip_count(eqn)
        elif name == "dot_general":
            c.mxu_macs += _dot_macs(eqn)
        elif name in _ELEMENTWISE:
            c.vpu_ops += _out_elems(eqn)
        elif name in _FREE:
            pass
        else:
            # unknown primitive: cost 1 op/elem so new ops are never
            # silently free
            c.vpu_ops += _out_elems(eqn)
    return c


def count_fn(fn, *args) -> Counts:
    """Counts for fn(*args) — traces only, never executes or compiles."""
    return count_jaxpr(jax.make_jaxpr(fn)(*args))


def count_pbs(p, batch: int, torus_base: int = 4,
              unfolding: int = 1) -> Counts:
    """Per-bootstrap counts for the production functional bootstrap at
    parameter set `p` (a `params.TFHEParams`), batch `batch`, tracing the
    REAL program (kernel path forced for trace via
    MOSFHET_TPU_FORCE_KERNEL — tracing never executes the kernels, so
    this works on any backend)."""
    import os
    import jax.numpy as jnp
    from .. import params as _params  # noqa: F401  (type of `p`)
    from .. import tlwe, trlwe, trgsw, bootstrap
    saved = os.environ.get("MOSFHET_TPU_FORCE_KERNEL")
    os.environ["MOSFHET_TPU_FORCE_KERNEL"] = "1"
    try:
        kt = jax.eval_shape(lambda r: tlwe.new_binary_key(
            r, p.n, p.lwe_sigma), jax.random.PRNGKey(0))
        kr = tlwe_key = None
        kr = jax.eval_shape(lambda r: trlwe.new_binary_key(
            r, p.N, p.k, p.rlwe_sigma), jax.random.PRNGKey(0))
        del tlwe_key
        # TRGSWKey holds the plan statically: build it concretely (cheap)
        kr_c = trlwe.new_binary_key(jax.random.PRNGKey(0), p.N, p.k,
                                    p.rlwe_sigma)
        gk = trgsw.new_key(kr_c, p.l, p.Bg_bit)
        bk = jax.eval_shape(
            lambda r, k_: bootstrap.new_key(r, gk, k_, unfolding),
            jax.random.PRNGKey(0), kt)
        tv = trlwe.TRLWE(
            a=jax.ShapeDtypeStruct((p.k, p.N), jnp.uint64),
            b=jax.ShapeDtypeStruct((p.N,), jnp.uint64))
        cs = tlwe.TLWE(
            a=jax.ShapeDtypeStruct((batch, p.n), jnp.uint64),
            b=jax.ShapeDtypeStruct((batch,), jnp.uint64))
        jaxpr = jax.make_jaxpr(
            lambda tv, cs, bk: bootstrap.functional_bootstrap(
                tv, cs, bk, torus_base))(tv, cs, bk)
    finally:
        if saved is None:
            os.environ.pop("MOSFHET_TPU_FORCE_KERNEL", None)
        else:
            os.environ["MOSFHET_TPU_FORCE_KERNEL"] = saved
    return count_jaxpr(jaxpr) * (1.0 / batch)


def report(counts_per_op: Counts, seconds_per_op: float) -> dict:
    """MFU per resource + the binding one.

    `mfu` = achieved fraction of the chip's speed-of-light on the binding
    resource; `sol_ms` is the analytic lower-bound time.
    """
    t_vpu = counts_per_op.vpu_ops / V5E_VPU_OPS
    t_mxu = counts_per_op.mxu_macs / V5E_MXU_I8_MACS
    t_hbm = counts_per_op.hbm_bytes / V5E_HBM_BPS
    bound, t_bound = max(
        (("vpu", t_vpu), ("mxu", t_mxu), ("hbm", t_hbm)),
        key=lambda kv: kv[1])
    return {
        "mfu": round(t_bound / seconds_per_op, 4),
        "bound": bound,
        "mfu_vpu": round(t_vpu / seconds_per_op, 4),
        "mfu_mxu": round(t_mxu / seconds_per_op, 4),
        "hbm_frac": round(t_hbm / seconds_per_op, 4),
        "sol_ms": round(t_bound * 1e3, 4),
        "vpu_gop": round(counts_per_op.vpu_ops / 1e9, 3),
        "mxu_gmac": round(counts_per_op.mxu_macs / 1e9, 3),
        "hbm_mib": round(counts_per_op.hbm_bytes / 2**20, 2),
    }
