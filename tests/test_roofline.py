"""Roofline op counting (`utils/roofline.py`): exact counts on known
programs, and the production PBS trace yields self-consistent numbers.

The reference's cost model is FFT counts (SURVEY §3.1, `benchmark_arith.c`);
ours is resource counts read off the real jaxpr, so these tests pin the
counting rules (elementwise = out-elems, dot_general = M*N*K MACs, scan and
fori-while multiply by trip count, pallas grid multiplies the kernel body).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosfhet_tpu import params
from mosfhet_tpu.utils import roofline


def test_elementwise_and_dot_counts():
    def f(a, b):
        c = a * b + a          # 2 elementwise ops x 8*128
        return jnp.dot(c, b.T.astype(jnp.int8).astype(jnp.float32))

    a = jnp.ones((8, 128), jnp.float32)
    b = jnp.ones((8, 128), jnp.float32)
    c = roofline.count_fn(f, a, b)
    assert c.mxu_macs == 8 * 8 * 128            # [8,128] @ [128,8]
    # 2 arith ops + transpose-side casts; at least the arith floor
    assert c.vpu_ops >= 2 * 8 * 128


def test_scan_and_fori_multiply():
    def f(x):
        def body(c, _):
            return c + x, None
        y, _ = jax.lax.scan(body, x, None, length=7)

        def fbody(j, c):
            return c * x
        z = jax.lax.fori_loop(jnp.int32(0), jnp.int32(5), fbody, y)
        return z

    x = jnp.ones((8, 128), jnp.float32)
    c = roofline.count_fn(f, x)
    # 7 scan adds + 5 fori muls (+ fori counter increments, 5 scalar ops)
    assert 12 * 8 * 128 <= c.vpu_ops <= 12 * 8 * 128 + 16


def test_pallas_grid_multiplies():
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * x_ref[...] + x_ref[...]

    f = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    c = roofline.count_fn(f, jnp.ones((8, 128), jnp.float32))
    assert c.vpu_ops == 4 * 2 * 8 * 128
    # HBM model: blocks whose index map is CONSTANT across the grid are
    # fetched once (Mosaic revisiting) — in + out = 2 blocks
    assert c.hbm_bytes == 2 * 8 * 128 * 4


def test_pallas_hbm_varies_with_grid():
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.float32(1)

    f = pl.pallas_call(
        kern, grid=(4,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, i * 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, i * 0)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))
    c = roofline.count_fn(f, jnp.ones((32, 128), jnp.float32))
    # index map varies with the grid dim: 4 fetches each way
    assert c.hbm_bytes == 2 * 4 * 8 * 128 * 4


@pytest.mark.parametrize("mxu", ["0", "1"])
def test_count_pbs_production(monkeypatch, mxu):
    """The L2 PBS trace counts: positive, VPU-bound, MXU work present
    exactly when the MXU plan is active, and the roll plan costs more
    VPU ops than the MXU plan (that is the measured +28% win's origin)."""
    monkeypatch.setenv("MOSFHET_NTT_MXU", mxu)
    c = roofline.count_pbs(params.TFHEPP_L2, 64)   # one full BT=64 tile
    assert c.vpu_ops > 1e9                       # gigaops per bootstrap
    assert c.hbm_bytes > 1e6
    if mxu == "1":
        assert c.mxu_macs > 1e9
    else:
        assert c.mxu_macs == 0
    r = roofline.report(c, 1.0 / 441)
    assert r["bound"] == "vpu"
    assert 0 < r["mfu"] <= 1.5                   # sane, not absurd
    assert r["sol_ms"] > 0
