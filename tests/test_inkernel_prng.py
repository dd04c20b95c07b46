"""Bit-exactness of the kernel-side threefry (`ops/prng.py`) against
jax.random — the seeded-sample format decrypts only if this holds."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mosfhet_tpu import rng, seeded, trlwe
from mosfhet_tpu.ops import prng as kprng


def test_random_u32_at_matches_jax_bits():
    key = jax.random.PRNGKey(20260819)
    kd = jax.random.key_data(key).astype(jnp.uint32)
    for total in (8, 2048, 4096):
        want = jax.random.bits(key, (total,), dtype=jnp.uint32)
        got = kprng.random_u32_at(kd[0], kd[1],
                                  jnp.arange(total, dtype=jnp.int32),
                                  total)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_mask_words_match_uniform_torus():
    """hi/lo words at every flat index == rng.uniform_torus(key, (k, N))
    == the mask `seeded._expand_a` regenerates."""
    k, N = 2, 128
    key = jax.random.PRNGKey(77)
    kd = jax.random.key_data(key).astype(jnp.uint32)
    fkd = kprng.folded_key_data(kd)
    want = rng.uniform_torus(key, (k, N)).reshape(-1)
    f = jnp.arange(k * N, dtype=jnp.int32)
    hi, lo = kprng.mask_u64_words_at(kd, fkd, f, k * N)
    got = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    # and the seeded-sample expansion path end to end
    exp = seeded._expand_a(kd, k, N).reshape(-1)
    np.testing.assert_array_equal(np.asarray(exp), np.asarray(got))


def test_threefry_inside_pallas_kernel():
    """The cipher runs inside a Pallas kernel (interpret mode) and
    reproduces jax.random.bits on a [BT, N] tile."""
    BT, N = 8, 256
    key = jax.random.PRNGKey(4242)
    kd = jax.random.key_data(key).astype(jnp.uint32)

    def kernel(k_ref, o_ref):
        f = jax.lax.broadcasted_iota(jnp.int32, (BT, N), 0) * N + \
            jax.lax.broadcasted_iota(jnp.int32, (BT, N), 1)
        o_ref[...] = kprng.random_u32_at(k_ref[0], k_ref[1], f, BT * N)

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((BT, N), jnp.uint32),
        interpret=True,
    )(kd)
    want = jax.random.bits(key, (BT * N,), dtype=jnp.uint32).reshape(BT, N)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(out))
