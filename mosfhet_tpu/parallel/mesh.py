"""Multi-chip scale-out for batched programmable bootstrapping.

The reference is a single-threaded CPU library (SURVEY.md §2.2: no
MPI/NCCL/pthreads anywhere); its only parallelism is SIMD.  The TPU-native
equivalents here are first-class:

- **batch axis ("data")**: independent bootstraps are embarrassingly
  parallel — shard the ciphertext batch, replicate the bootstrap key.
  Zero communication during blind rotation.
- **gadget axis ("model")**: the external product accumulates over the
  J=(k+1)*l decomposition rows; shard the bootstrap key's J axis and
  `psum` the NTT-domain accumulator each CMUX step (tensor-parallel
  analog).  Trades ICI bandwidth for HBM footprint of the key — relevant
  when the key (hundreds of MB to GB in NTT form) is sharded rather than
  replicated.

Built on `jax.sharding.Mesh` + `shard_map`; collectives are XLA's.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import ntt as _ntt
from .. import polynomial as _poly
from .. import trlwe as _trlwe
from ..bootstrap import BootstrapKey, _prec_offset
from ..tlwe import TLWE
from ..trlwe import TRLWE, from_stacked
from ..torus import TORUS_DTYPE, torus2int, gadget_decompose


def make_mesh(devices=None, data: int = None, model: int = 1,
              names=("data", "model")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n
    import numpy as np
    return Mesh(np.array(devices).reshape(data, model), names)


def _blind_rotate_tp(acc_st, a_int, bk_v, bk_vs, plan, l, Bg_bit, k, N,
                     model_axis: str | None):
    """Blind rotate where bk_v/bk_vs may be sharded on the J (row) axis;
    partial external products are psum'd over `model_axis`.  Honors the
    MOSFHET_ROT_NTT rotation-free step (`bootstrap._cmux_step_rotntt`):
    the (zeta^a - 1) twiddle is scalar per (row, lane) so it commutes
    with the cross-shard psum and is applied to the summed spec."""
    rotntt = _ntt.rot_ntt_enabled() and plan.barrett_ok

    def step(carry, xs):
        v, vs, ai = xs
        if rotntt:
            digits = gadget_decompose(carry, Bg_bit, l)
        else:
            rot = _poly.mul_by_xai(carry, ai[..., None]) - carry
            digits = gadget_decompose(rot, Bg_bit, l)
        digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
        if model_axis is not None:
            # each shard holds J/m rows of the key: slice matching digits
            m = jax.lax.axis_size(model_axis)
            idx = jax.lax.axis_index(model_axis)
            jm = (k + 1) * l // m
            digits = jax.lax.dynamic_slice_in_dim(digits, idx * jm, jm, -2)
        spec = _ntt.to_ntt_small(digits, plan)
        part = _ntt.pointwise_mul_acc_key(
            spec[..., :, None, :, :], v, vs, plan, axis=-4)
        if model_axis is not None:
            part = jax.lax.psum(part, model_axis)
            part = _ntt.barrett_small(part, plan.p[:, None], plan.mu[:, None])
        if rotntt:
            t = _ntt.xpow(ai, plan) - jnp.uint64(1)
            part = _ntt.barrett_mul(part, t[..., None, :, :], plan)
        return carry + _ntt.from_ntt_u64(part, plan), None

    out, _ = jax.lax.scan(step, acc_st, (bk_v, bk_vs, a_int))
    return out


def _blind_rotate_tp_kernel(acc, a_scan, bk_v32, bk_vs32, kp,
                            model_axis: str | None, m_size: int,
                            interpret: bool = False):
    """Kernel-speed blind rotate with the key's J axis sharded over
    `model_axis`: each step runs the fused partial kernel over this
    shard's key rows (rotate + decompose + fwd NTT + mul-acc), psums the
    exact (< p) NTT-domain partials across shards, and finishes (inverse
    NTT + garner + carry add) in a second kernel.  Bit-identical to the
    replicated fused kernel: the partials are exact residues, their true
    sum stays < m*p < 2^32, and `_inv_ntt` output is canonical.

    acc: [Bs, C, N] torus; a_scan: [n, Bs] i32;
    bk_v32/bk_vs32: [n, J/m, C, P, N] u32 (this shard's rows)."""
    from ..ops import pbs_kernel as _pk
    # the cross-shard psum of m exact (< p) u32 partials must not wrap —
    # asserted here (not only in pbs_on_mesh's auto selection) so an
    # explicit impl="pallas" cannot silently corrupt ciphertexts
    assert m_size * max(kp.primes) < 2**32, (
        f"kernel TP psum overflows u32: {m_size} shards x max prime "
        f"{max(kp.primes)} >= 2^32; use fewer model shards or impl='jnp'")
    Bs = acc.shape[0]
    nb = Bs // kp.bt
    tiles = _pk.split_limbs(acc, kp)
    a_tiles = a_scan.reshape(a_scan.shape[0], nb, kp.bt, 1)
    if model_axis is not None and m_size > 1:
        j_local = kp.J // m_size
        j0 = (jax.lax.axis_index(model_axis).astype(jnp.int32)
              * jnp.int32(j_local))[None]
    else:
        j0 = jnp.zeros((1,), jnp.int32)

    def step(carry, xs):
        v32, vs32, ai = xs
        spec = _pk.partial_step_tiles(carry, ai, j0, v32, vs32, kp,
                                      interpret=interpret)
        if model_axis is not None and m_size > 1:
            spec = jax.lax.psum(spec, model_axis)
        return _pk.finish_step_tiles(carry, spec, kp, m_size,
                                     interpret=interpret), None

    out, _ = jax.lax.scan(step, tiles, (bk_v32, bk_vs32, a_tiles))
    return _pk.merge_limbs(out)


def pbs_on_mesh(mesh: Mesh, bk: BootstrapKey, torus_base: int,
                data_axis: str = "data", model_axis: str | None = "model",
                impl: str = "auto", interpret: bool = False):
    """Returns a jitted, mesh-sharded batched functional bootstrap:
    fn(tv: TRLWE[B, ...], c: TLWE[B, ...]) -> TLWE[B, k*N].

    Ciphertext batch is sharded over `data_axis`; the bootstrap key's J axis
    is sharded over `model_axis` (pass None to replicate the key).

    impl: "auto" uses the fused Pallas kernel per data shard on TPU —
    replicated key: pure data parallelism, communication-free blind
    rotate; J-sharded key (model > 1): the kernel-TP path
    (`_blind_rotate_tp_kernel`, per-step psum of exact NTT-domain
    partials), selected only when m_size * max(prime) < 2^32 so the u32
    psum cannot wrap (also asserted in the kernel path itself).
    Non-TPU platforms and ineligible configs use the portable jnp path.
    All paths are exact.  The kernel paths pad each shard's batch up to
    the kernel tile (32) and truncate after.
    """
    assert bk.unfolding == 1
    plan = bk.plan()
    N, k, l, Bg_bit = bk.N, bk.k, bk.l, bk.Bg_bit
    log_N2 = int(math.log2(2 * N))
    J = (k + 1) * l
    m_size = mesh.shape[model_axis] if model_axis else 1
    assert J % m_size == 0
    if impl == "auto":
        from .. import bootstrap as _bs
        # kernel TP needs the psum of m exact partials to fit u32
        tp_ok = m_size == 1 or (J % m_size == 0
                                and m_size * max(bk.primes) < 2**32)
        impl = ("pallas" if tp_ok and _bs._pallas_eligible(bk)
                else "jnp")

    bk_spec = P(None, model_axis, None, None, None) if model_axis else \
        P(None, None, None, None, None)
    in_specs = (
        P(data_axis), P(data_axis),        # tv stacked, b rounding input
        P(data_axis),                      # a
        bk_spec, bk_spec,
    )
    out_specs = P(data_axis)

    def inner(tv_st, b, a, bk_v, bk_vs):
        b_int = torus2int(b + _prec_offset(torus_base), log_N2).astype(jnp.int32)
        acc = _poly.mul_by_xai(tv_st, (2 * N - b_int)[..., None])
        a_int = torus2int(a, log_N2).astype(jnp.int32)
        a_scan = jnp.moveaxis(a_int, -1, 0)
        if impl == "pallas":
            from ..ops import pbs_kernel as _pk
            kp = _pk.get_kernel_plan(N, bk.primes, l, Bg_bit, k)
            Bs = acc.shape[0]
            pad = (-Bs) % kp.bt         # per-shard batch -> kernel tile
            if pad:
                acc = jnp.concatenate(
                    [acc, jnp.zeros((pad,) + acc.shape[1:], acc.dtype)],
                    axis=0)
                a_scan = jnp.concatenate(
                    [a_scan, jnp.zeros(a_scan.shape[:-1] + (pad,),
                                       jnp.int32)], axis=-1)
            if m_size > 1:
                out = _blind_rotate_tp_kernel(
                    acc, a_scan, bk_v.astype(jnp.uint32),
                    bk_vs.astype(jnp.uint32), kp, model_axis, m_size,
                    interpret=interpret)
            else:
                out = _pk.blind_rotate_scan(
                    acc, a_scan, bk_v.astype(jnp.uint32),
                    bk_vs.astype(jnp.uint32), kp, interpret=interpret)
            return out[:Bs] if pad else out
        acc = _blind_rotate_tp(acc, a_scan, bk_v, bk_vs, plan, l, Bg_bit,
                               k, N, model_axis if m_size > 1 else None)
        return acc

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the default vma check rejects inside shard_map
    sharded = shard_map(inner, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)

    # key arrays are jit arguments (closing over them would embed GiB-scale
    # constants in the compile payload)
    @jax.jit
    def _run(tv_st, cb, ca, bkv, bkvs):
        acc_st = sharded(tv_st, cb, ca, bkv, bkvs)
        return _trlwe.extract_tlwe(from_stacked(acc_st), 0)

    def run(tv: TRLWE, c: TLWE) -> TLWE:
        return _run(tv.stacked(), c.b, c.a, bk.v, bk.vs)

    return run


def unfolded_pbs_on_mesh(mesh: Mesh, bk: BootstrapKey, torus_base: int,
                         data_axis: str = "data",
                         model_axis: str | None = None):
    """Mesh-sharded UNFOLDED blind-rotate bootstrap
    (`blind_rotate_unfolded`, reference `bootstrap.c:124-148`).

    Batch over `data_axis`.  With `model_axis`, the unfolded key's 2^u
    expansion axis is sharded: each shard rotates and sums its 2^u/m key
    TRGSWs and the u64 combines are psum'd per group — exact, because the
    combine is a plain wraparound-u64 sum (the mod-2^64 reduction HAS to
    happen before the NTT, ROADMAP's CRT-bound analysis, and addition
    commutes with psum mod 2^64).  The NTT + external product then run
    replicated per data shard.  Returns fn(tv[B...], c[B...]) -> TLWE.
    """
    from .. import bootstrap as _bs
    assert bk.unfolding > 1
    plan = bk.plan()
    u, N, k, l, Bg_bit = bk.unfolding, bk.N, bk.k, bk.l, bk.Bg_bit
    key_exp = 1 << u
    log_N2 = int(math.log2(2 * N))
    m_size = mesh.shape[model_axis] if model_axis else 1
    assert key_exp % m_size == 0
    eu = key_exp // m_size

    # su limb planes are [nl, G, 2^u, R, C, N]: shard the 2^u axis
    su_spec = P(None, None, model_axis) if model_axis else P()
    in_specs = (P(data_axis), P(data_axis), P(data_axis), su_spec)

    def inner(tv_st, b, a, su_planes):
        su = su_planes[0].astype(jnp.uint64) if su_planes.shape[0] == 1 \
            else (su_planes[0].astype(jnp.uint64)
                  | (su_planes[1].astype(jnp.uint64) << jnp.uint64(32)))
        b_int = torus2int(b + _prec_offset(torus_base),
                          log_N2).astype(jnp.int32)
        acc0 = _poly.mul_by_xai(tv_st, (2 * N - b_int)[..., None])
        a_arr = jnp.asarray(a, TORUS_DTYPE)
        rot = _bs._unfold_rotations(a_arr, bk)           # [..., G, 2^u]
        if model_axis is not None and m_size > 1:
            idx = jax.lax.axis_index(model_axis)
            rot = jax.lax.dynamic_slice_in_dim(rot, idx * eu, eu, -1)
        rot_scan = jnp.moveaxis(rot, -2, 0)              # [G, ..., eu]

        def step(acc_st, xs):
            su_g, rot_g = xs                             # [eu, R, C, N]
            rotated = _poly.mul_by_xai(su_g, rot_g[..., :, None, None])
            comb = jnp.sum(rotated, axis=-4, dtype=TORUS_DTYPE)
            if model_axis is not None and m_size > 1:
                comb = jax.lax.psum(comb, model_axis)    # exact mod 2^64
            gd = _ntt.to_ntt_u64(comb, plan)
            digits = gadget_decompose(acc_st, Bg_bit, l)
            digits = digits.reshape(digits.shape[:-3] + ((k + 1) * l, N))
            spec = _ntt.to_ntt_small(digits, plan)
            acc_ntt = _ntt.pointwise_mul_acc_generic(
                spec[..., :, None, :, :], gd, plan, axis=-4)
            return _ntt.from_ntt_u64(acc_ntt, plan), None

        out, _ = jax.lax.scan(step, acc0, (su, rot_scan))
        return out

    sharded = shard_map(inner, mesh=mesh, in_specs=in_specs,
                        out_specs=P(data_axis), check_vma=False)

    @jax.jit
    def _run(tv_st, cb, ca, su_planes):
        acc_st = sharded(tv_st, cb, ca, su_planes)
        return _trlwe.extract_tlwe(from_stacked(acc_st), 0)

    def run(tv: TRLWE, c: TLWE) -> TLWE:
        return _run(tv.stacked(), c.b, c.a, bk.su)

    return run


def ga_pbs_on_mesh(mesh: Mesh, bkg, torus_base: int,
                   data_axis: str = "data",
                   model_axis: str | None = None):
    """Mesh-sharded Galois-automorphism bootstrap
    (`blind_rotate_ga`, reference `bootstrap_ga.c:39-60`).

    Batch over `data_axis`.  With `model_axis`, BOTH row-sum contractions
    are tensor-parallel: the external product's J=(k+1)l gadget rows
    (s_v) and the automorphism keyswitch's k*t rows (ak_v) are sharded,
    each step psum-ing the NTT-domain partial accumulators (u64 residues
    < p; the sum of m partials is reduced right after, exactly as the
    single-device row sum).  Returns fn(tv[B...], c[B...]) -> TLWE.
    """
    from .. import bootstrap_ga as _bga
    from .. import keyswitch as _ks
    N, k, l, Bg_bit = bkg.N, bkg.k, bkg.l, bkg.Bg_bit
    t, base_bit = bkg.ks_t, bkg.ks_base_bit
    plan = bkg.plan()
    ks_plan = bkg.ks_plan()
    log_N2 = int(math.log2(2 * N))
    mod_mask = 2 * N - 1
    J = (k + 1) * l
    Jk = k * t
    m_size = mesh.shape[model_axis] if model_axis else 1
    # TP each of the two row contractions only where the row count is
    # divisible by the model size; the other table is replicated (still
    # correct, just no HBM saving for it)
    tp_j = m_size > 1 and J % m_size == 0
    tp_jk = m_size > 1 and Jk % m_size == 0
    jm = J // m_size if tp_j else J
    jkm = Jk // m_size if tp_jk else Jk

    # s_v: [n, J, C, P, N] rows sharded on axis 1; ak_v: [N, Jk, C, P, N]
    sv_spec = P(None, model_axis) if tp_j else P()
    ak_spec = P(None, model_axis) if tp_jk else P()
    in_specs = (P(data_axis), P(data_axis), P(data_axis),
                sv_spec, sv_spec, ak_spec, ak_spec, P())

    def inner(tv_st, b, a, sv, svs, akv, akvs, inv2n):
        idx = jax.lax.axis_index(model_axis) if (tp_j or tp_jk) else 0

        def ext_prod(acc_st, gv, gvs):
            digits = gadget_decompose(acc_st, Bg_bit, l)
            digits = digits.reshape(digits.shape[:-3] + (J, N))
            if tp_j:
                digits = jax.lax.dynamic_slice_in_dim(
                    digits, idx * jm, jm, -2)
            spec = _ntt.to_ntt_small(digits, plan)
            r = _ntt.pointwise_mul_acc_key(
                spec[..., :, None, :, :], gv, gvs, plan, axis=-4)
            if tp_j:
                r = jax.lax.psum(r, model_axis)
                r = _ntt.barrett_small(r, plan.p[:, None], plan.mu[:, None])
            return _ntt.from_ntt_u64(r, plan)

        def eval_auto(acc_st, gen):
            perm = _bga._permute_dyn(acc_st, gen, inv2n, N)
            kidx = (gen - 1) >> 1
            kv = jnp.take(akv, kidx, axis=0)
            kvs = jnp.take(akvs, kidx, axis=0)
            aa = perm[..., :k, :]
            bb = perm[..., k, :]
            digits = _ks._decompose_digits(aa, base_bit, t)
            if tp_jk:
                digits = jax.lax.dynamic_slice_in_dim(
                    digits, idx * jkm, jkm, -2)
            spec = _ntt.to_ntt_small(digits, ks_plan)
            acc = _ntt.pointwise_mul_acc_key(
                spec[..., :, None, :, :], kv, kvs, ks_plan, axis=-4)
            if tp_jk:
                acc = jax.lax.psum(acc, model_axis)
                acc = _ntt.barrett_small(acc, ks_plan.p[:, None],
                                         ks_plan.mu[:, None])
            as_ = _ntt.from_ntt_u64(acc, ks_plan)
            out = jnp.zeros_like(perm).at[..., k, :].set(bb)
            return out - as_

        b_int = torus2int(b + _prec_offset(torus_base),
                          log_N2).astype(jnp.int32)
        acc0 = _poly.mul_by_xai(tv_st, (2 * N - b_int)[..., None])
        a_int = (torus2int(jnp.asarray(a, TORUS_DTYPE), log_N2)
                 .astype(jnp.int32) | 1)
        w = jnp.take(inv2n, (a_int - 1) >> 1, axis=0)
        acc = eval_auto(acc0, w[..., 0])
        gens = (a_int[..., :-1] * w[..., 1:]) & mod_mask
        gens_scan = jnp.moveaxis(gens, -1, 0)

        def step(acc_st, xs):
            gv, gvs, gen = xs
            return eval_auto(ext_prod(acc_st, gv, gvs), gen), None

        acc, _ = jax.lax.scan(step, acc, (sv[:-1], svs[:-1], gens_scan))
        tl = ext_prod(acc, sv[-1], svs[-1])
        return eval_auto(tl, a_int[..., -1])

    sharded = shard_map(inner, mesh=mesh, in_specs=in_specs,
                        out_specs=P(data_axis), check_vma=False)

    @jax.jit
    def _run(tv_st, cb, ca, sv, svs, akv, akvs, inv2n):
        acc_st = sharded(tv_st, cb, ca, sv, svs, akv, akvs, inv2n)
        return _trlwe.extract_tlwe(from_stacked(acc_st), 0)

    def run(tv: TRLWE, c: TLWE) -> TLWE:
        return _run(tv.stacked(), c.b, c.a, bkg.s_v, bkg.s_vs,
                    bkg.ak_v, bkg.ak_vs, bkg.inv2n)

    return run
