"""Compile-probe Mosaic's DMA slice alignment rules on the real TPU.

The GA stream kernel's per-row DMA (HBM keyset entry -> VMEM scratch at
sublane r) was rejected with "Slice shape along dimension 3 must be
aligned to tiling (4), but is 3" (src [G, Jk, C, P, N] has last-two dims
(P=3, N) tiled (4, 128)).  Each probe compiles a minimal kernel with one
candidate layout; the result table decides the production layout:

  A: src flattened [G, JkCP, N] (24 % 8 == 0), dst [JkCP, bt, N] sliced
     at sublane r (tests whether an extent-1 slice of a TILED dst dim is
     legal for DMA).
  B: unit-minor trick — src [G, JkCP, 1, N] and dst [JkCP, bt, 1, N],
     (1, 128) tilings, every sliced dim untiled.
  C: src padded [G, Jk, C, 4, N], dst [Jk, C, 4, bt, N] at sublane r
     (tests whether padding P to the tile fixes src AND dst is lenient).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

G, JK, C, P, BT, N = 8, 4, 2, 3, 32, 2048
JCP = JK * C * P


def probe(name, make):
    try:
        out = make()
        jax.block_until_ready(out)
        print(json.dumps({"probe": name, "ok": True}), flush=True)
        return True
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "must be aligned" in l
               or "Mosaic" in l or "NotImplemented" in l][:1]
        print(json.dumps({"probe": name, "ok": False,
                          "err": (key[0] if key else msg)[-180:]}),
              flush=True)
        return False


def variant_a():
    def kernel(kidx_ref, ak_ref, o_ref, scr, sem):
        i = pl.program_id(0)
        for r in range(BT):
            idx = kidx_ref[i * BT + r]
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], scr.at[:, jnp.int32(r)],
                sem.at[jnp.int32(r)])
            cp.start()
            cp.wait()
        o_ref[0] = scr[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BT, N), lambda i, k: (i, i * 0, i * 0)),
        scratch_shapes=[pltpu.VMEM((JCP, BT, N), jnp.uint32),
                        pltpu.SemaphoreType.DMA((BT,))])
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((1, BT, N),
                                                      jnp.uint32))
    kidx = jnp.zeros((BT,), jnp.int32)
    ak = jnp.zeros((G, JCP, N), jnp.uint32)
    return jax.jit(f)(kidx, ak)


def variant_b():
    def kernel(kidx_ref, ak_ref, o_ref, scr, sem):
        i = pl.program_id(0)
        for r in range(BT):
            idx = kidx_ref[i * BT + r]
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], scr.at[:, jnp.int32(r)],
                sem.at[jnp.int32(r)])
            cp.start()
            cp.wait()
        o_ref[0] = scr[0, 0, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, N), lambda i, k: (i, i * 0, i * 0)),
        scratch_shapes=[pltpu.VMEM((JCP, BT, 1, N), jnp.uint32),
                        pltpu.SemaphoreType.DMA((BT,))])
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((1, 1, N),
                                                      jnp.uint32))
    kidx = jnp.zeros((BT,), jnp.int32)
    ak = jnp.zeros((G, JCP, 1, N), jnp.uint32)
    return jax.jit(f)(kidx, ak)


def variant_c():
    def kernel(kidx_ref, ak_ref, o_ref, scr, sem):
        i = pl.program_id(0)
        for r in range(BT):
            idx = kidx_ref[i * BT + r]
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], scr.at[:, :, :, jnp.int32(r)],
                sem.at[jnp.int32(r)])
            cp.start()
            cp.wait()
        o_ref[0] = scr[0, 0, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BT, N), lambda i, k: (i, i * 0, i * 0)),
        scratch_shapes=[pltpu.VMEM((JK, C, 4, BT, N), jnp.uint32),
                        pltpu.SemaphoreType.DMA((BT,))])
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((1, BT, N),
                                                      jnp.uint32))
    kidx = jnp.zeros((BT,), jnp.int32)
    ak = jnp.zeros((G, JK, C, 4, N), jnp.uint32)
    return jax.jit(f)(kidx, ak)


def variant_b_read():
    """B + the consumer read pattern: [bt, N] per jcp row from the
    (1, 128)-tiled scratch (strided sublane assembly)."""
    def kernel(kidx_ref, ak_ref, o_ref, scr, sem):
        i = pl.program_id(0)
        for r in range(BT):
            idx = kidx_ref[i * BT + r]
            cp = pltpu.make_async_copy(
                ak_ref.at[idx], scr.at[:, jnp.int32(r)],
                sem.at[jnp.int32(r)])
            cp.start()
            cp.wait()
        acc = jnp.zeros((BT, N), jnp.uint32)
        for jcp in range(JCP):
            acc = acc + scr[jcp, :, 0]
        o_ref[0] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BT, N), lambda i, k: (i, i * 0, i * 0)),
        scratch_shapes=[pltpu.VMEM((JCP, BT, 1, N), jnp.uint32),
                        pltpu.SemaphoreType.DMA((BT,))])
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((1, BT, N),
                                                      jnp.uint32))
    kidx = jnp.zeros((BT,), jnp.int32)
    ak = jnp.zeros((G, JCP, 1, N), jnp.uint32)
    return jax.jit(f)(kidx, ak)


def main():
    for name, fn in [("A_flat_src_sublane_dst", variant_a),
                     ("B_unit_minor", variant_b),
                     ("B_read", variant_b_read),
                     ("C_pad_p4", variant_c)]:
        probe(name, fn)


if __name__ == "__main__":
    main()
