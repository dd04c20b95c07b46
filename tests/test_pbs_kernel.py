"""The fused Pallas CMUX kernel must be bit-identical to the jnp NTT path.

Runs in Pallas interpreter mode on the CPU test platform; the same kernel
was validated on a real TPU v5e chip (exact match at N=2048 L2 params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosfhet_tpu import ntt as _ntt
from mosfhet_tpu.torus import gadget_decompose
from mosfhet_tpu.ops import pbs_kernel as pk


@pytest.mark.parametrize("N,k,l,Bg_bit", [
    (256, 1, 3, 9),
    (256, 2, 2, 8),
    (512, 1, 1, 23),   # SET_2-style single-digit decomposition
])
def test_cmux_delta_exact(N, k, l, Bg_bit):
    C = k + 1
    J = C * l
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    plan = _ntt.get_plan(N, primes)
    P = plan.P

    rng = np.random.default_rng(1234 + N + l)
    B = 32
    rot = jnp.asarray(
        rng.integers(0, 1 << 64, size=(B, C, N), dtype=np.uint64))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])

    digits = gadget_decompose(rot, Bg_bit, l).reshape(B, J, N)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], keyv, keyvs, plan, axis=-4)
    want = _ntt.from_ntt_u64(acc, plan)

    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32)
    got = pk.cmux_delta(rot, keyv.astype(jnp.uint32),
                        keyvs.astype(jnp.uint32), kp, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_batch_padding_path():
    """blind_rotate's pallas wrapper pads batches to the tile size; check
    cmux_delta at exactly one tile with a non-trivial high-limb carry."""
    N, k, l, Bg_bit = 256, 1, 2, 10
    C, J = k + 1, (k + 1) * l
    primes = _ntt.primes_for_bound(_ntt.conv_bound(N, 1 << (Bg_bit - 1), J))
    plan = _ntt.get_plan(N, primes)
    rng = np.random.default_rng(7)
    rot = jnp.asarray(
        rng.integers((1 << 63), 1 << 64, size=(32, C, N), dtype=np.uint64))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(J, C, plan.P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])
    digits = gadget_decompose(rot, Bg_bit, l).reshape(32, J, N)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], keyv, keyvs, plan, axis=-4)
    want = _ntt.from_ntt_u64(acc, plan)
    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32)
    got = pk.cmux_delta(rot, keyv.astype(jnp.uint32),
                        keyvs.astype(jnp.uint32), kp, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.parametrize("N,k,l,Bg_bit", [
    (256, 1, 3, 9),
    (128, 1, 2, 10),   # no head stages: the matmul tail is the whole NTT
    (512, 2, 2, 8),
])
def test_cmux_delta_mxu_tail(N, k, l, Bg_bit):
    """The MXU forward-NTT tail (per-block twist + shared int8 limb
    matmul, `_fwd_ntt_mxu`) must leave the CMUX delta bit-identical to
    the jnp path: the tail's lazy representatives match `_fwd_ntt` mod p
    and the inverse NTT output is canonical."""
    C = k + 1
    J = C * l
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    plan = _ntt.get_plan(N, primes)
    P = plan.P
    rng = np.random.default_rng(5150 + N)
    B = 32
    rot = jnp.asarray(
        rng.integers(0, 1 << 64, size=(B, C, N), dtype=np.uint64))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])
    digits = gadget_decompose(rot, Bg_bit, l).reshape(B, J, N)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], keyv, keyvs, plan, axis=-4)
    want = _ntt.from_ntt_u64(acc, plan)
    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=True)
    assert kp.use_mxu
    got = pk.cmux_delta(rot, keyv.astype(jnp.uint32),
                        keyvs.astype(jnp.uint32), kp, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_blind_rotate_scan_mxu():
    """The full fused-step scan under the MXU plan (forward tail as int8
    matmul, inverse head likewise with the row twist folded into the
    final reduction) must be bit-identical to the default lane-roll
    plan."""
    N, k, l, Bg_bit, n = 256, 1, 2, 9, 5
    C = k + 1
    J = C * l
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    plan = _ntt.get_plan(N, primes)
    P = plan.P
    rng = np.random.default_rng(77)
    B = 32
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 64, size=(B, C, N), dtype=np.uint64))
    a_int = jnp.asarray(
        rng.integers(0, 2 * N + 1, size=(n, B), dtype=np.int32))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(n, J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])
    v32, vs32 = keyv.astype(jnp.uint32), keyvs.astype(jnp.uint32)

    kp0 = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=False)
    kp1 = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=True)
    assert kp1.use_mxu and not kp0.use_mxu
    want = pk.blind_rotate_scan(acc0, a_int, v32, vs32, kp0,
                                interpret=True)
    got = pk.blind_rotate_scan(acc0, a_int, v32, vs32, kp1,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_cmux_delta_narrow_primes_lazy3():
    """NARROW_PRIMES (< 2^29) switch the forward NTT to depth-3 lazy
    chains (reduce every third stage, `_fwd_ntt(lazy3=True)`); the final
    accumulator must stay bit-identical to the jnp path — the lazy
    representatives differ mod p only, and the inverse NTT output is
    canonical."""
    N, k, l, Bg_bit = 256, 1, 3, 9
    C, J = k + 1, (k + 1) * l
    primes = _ntt.NARROW_PRIMES
    plan = _ntt.get_plan(N, primes)
    P = plan.P
    rng = np.random.default_rng(42)
    B = 32
    rot = jnp.asarray(
        rng.integers(0, 1 << 64, size=(B, C, N), dtype=np.uint64))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])
    digits = gadget_decompose(rot, Bg_bit, l).reshape(B, J, N)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], keyv, keyvs, plan, axis=-4)
    want = _ntt.from_ntt_u64(acc, plan)
    kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32)
    assert kp.lazy3 and not kp.barrett_ok
    got = pk.cmux_delta(rot, keyv.astype(jnp.uint32),
                        keyvs.astype(jnp.uint32), kp, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_blind_rotate_scan_fused_bit_exact():
    """The whole-scan single-pallas_call form (`blind_rotate_scan_fused`:
    grid (nb, n), VMEM-resident accumulator via block revisiting, key
    blocks pipelined over the step axis) is bit-identical to the
    per-step lax.scan form, on a multi-tile batch, both NTT plans."""
    N, k, l, Bg_bit, n = 256, 1, 2, 9, 5
    C = k + 1
    J = C * l
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    plan = _ntt.get_plan(N, primes)
    P = plan.P
    rng = np.random.default_rng(78)
    B = 64                                     # two bt=32 tiles
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 64, size=(B, C, N), dtype=np.uint64))
    a_int = jnp.asarray(
        rng.integers(0, 2 * N + 1, size=(n, B), dtype=np.int32))
    keyv = jnp.asarray(
        rng.integers(0, 1 << 62, size=(n, J, C, P, N), dtype=np.uint64)
        % np.array(primes, dtype=np.uint64)[None, None, None, :, None])
    keyvs = _ntt.make_shoup(keyv, plan.p[:, None])
    v32, vs32 = keyv.astype(jnp.uint32), keyvs.astype(jnp.uint32)
    for mxu in (False, True):
        kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=mxu)
        want = pk.blind_rotate_scan(acc0, a_int, v32, vs32, kp,
                                    interpret=True)
        got = pk.blind_rotate_scan_fused(acc0, a_int, v32, vs32, kp,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_apply_scan_fused_bit_exact():
    """Fused `ext_product_apply_scan` (grid (nb, G), revisited acc,
    pipelined step keys) == per-step scan form, broadcast and per-row
    key modes, both NTT plans."""
    N, k, l, Bg_bit = 256, 1, 2, 9
    C = k + 1
    J = C * l
    primes = _ntt.primes_for_bound(_ntt.conv_bound(N, 1 << (Bg_bit - 1), J))
    rs = np.random.default_rng(13)
    B, G = 64, 5
    acc0 = jnp.asarray(rs.integers(0, 1 << 64, (B, C, N), dtype=np.uint64))
    for mxu in (False, True):
        kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k, bt=32, mxu=mxu)
        P = kp.P
        sa = jnp.asarray(rs.integers(
            0, min(primes), (G, J, C, P, N), dtype=np.uint64)
        ).astype(jnp.uint32)
        sar = jnp.asarray(rs.integers(
            0, min(primes), (G, B, J, C, P, N), dtype=np.uint64)
        ).astype(jnp.uint32)
        for per_row, key in ((False, sa), (True, sar)):
            import os
            os.environ["MOSFHET_FUSED_SCAN"] = "0"
            try:
                want = pk.ext_product_apply_scan(acc0, key, kp,
                                                 per_row=per_row,
                                                 interpret=True)
            finally:
                os.environ.pop("MOSFHET_FUSED_SCAN", None)
            got = pk.ext_product_apply_scan(acc0, key, kp,
                                            per_row=per_row,
                                            interpret=True)
            np.testing.assert_array_equal(np.asarray(want),
                                          np.asarray(got))
