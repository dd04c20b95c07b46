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
