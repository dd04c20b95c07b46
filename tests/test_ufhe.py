"""ufhe encrypted-integer integration tests (`applications/
multi-ciphertext-arith/test/tests.c`), shrunk to TOY params."""

import jax
import pytest

from mosfhet_tpu import params
from mosfhet_tpu.apps import ufhe

KEY = jax.random.PRNGKey(31337)
P = params.TOY


@pytest.fixture(scope="module")
def ctx_keys():
    k0, k1 = jax.random.split(KEY)
    priv = ufhe.new_priv_keyset(k0, P)
    pub = ufhe.new_public_keyset(k1, priv, torus_base=4)
    ctx = ufhe.setup_context(pub)
    return priv, ctx


def test_encrypt_decrypt(ctx_keys):
    priv, ctx = ctx_keys
    for v in (0, 7, 13, 15):
        c = ufhe.encrypt_integer(jax.random.fold_in(KEY, v), v, 4, False,
                                 priv, ctx)
        assert ufhe.decrypt_integer(c, priv, ctx) == v
    c = ufhe.encrypt_integer(jax.random.fold_in(KEY, 99), (-3) % 16, 4, True,
                             priv, ctx)
    assert ufhe.decrypt_integer(c, priv, ctx) == -3


def test_add(ctx_keys):
    priv, ctx = ctx_keys
    a = ufhe.encrypt_integer(jax.random.fold_in(KEY, 1), 7, 4, False, priv, ctx)
    b = ufhe.encrypt_integer(jax.random.fold_in(KEY, 2), 6, 4, False, priv, ctx)
    c = ufhe.add_integer(a, b, 3, ctx)
    assert ufhe.decrypt_integer(c, priv, ctx) == 13


def test_sub(ctx_keys):
    priv, ctx = ctx_keys
    a = ufhe.encrypt_integer(jax.random.fold_in(KEY, 3), 9, 4, False, priv, ctx)
    b = ufhe.encrypt_integer(jax.random.fold_in(KEY, 4), 4, 4, False, priv, ctx)
    c = ufhe.sub_integer(a, b, 2, ctx)
    assert ufhe.decrypt_integer(c, priv, ctx) == 5


def test_mul(ctx_keys):
    priv, ctx = ctx_keys
    a = ufhe.encrypt_integer(jax.random.fold_in(KEY, 5), 5, 4, False, priv, ctx)
    b = ufhe.encrypt_integer(jax.random.fold_in(KEY, 6), 6, 4, False, priv, ctx)
    c = ufhe.mul_integer(a, b, 3, ctx)
    assert ufhe.decrypt_integer(c, priv, ctx) == 30


def test_cmp(ctx_keys):
    priv, ctx = ctx_keys
    for va, vb, want in ((3, 9, 0), (9, 9, 1), (12, 9, 2)):
        a = ufhe.encrypt_integer(jax.random.fold_in(KEY, 10 + va), va, 4,
                                 False, priv, ctx)
        b = ufhe.encrypt_integer(jax.random.fold_in(KEY, 20 + vb), vb, 4,
                                 False, priv, ctx)
        c = ufhe.cmp_integer(a, b, ctx)
        assert ufhe.decrypt_integer(c, priv, ctx) == want, (va, vb)


def test_relu(ctx_keys):
    priv, ctx = ctx_keys
    a = ufhe.encrypt_integer(jax.random.fold_in(KEY, 30), 5, 4, True,
                             priv, ctx)
    out = ufhe.relu_integer(a, ctx)
    assert ufhe.decrypt_integer(out, priv, ctx) == 5
    b = ufhe.encrypt_integer(jax.random.fold_in(KEY, 31), (-5) % 16, 4, True,
                             priv, ctx)
    out = ufhe.relu_integer(b, ctx)
    assert ufhe.decrypt_integer(out, priv, ctx) == 0


def test_lut_and_mux(ctx_keys):
    priv, ctx = ctx_keys
    sel = ufhe.encrypt_integer(jax.random.fold_in(KEY, 40), 5, 4, False,
                               priv, ctx)
    lut = [(3 * i + 1) % 16 for i in range(16)]
    out = ufhe.lut_integer(sel, lut, 16, 2, ctx)
    assert ufhe.decrypt_integer(out, priv, ctx) == lut[5]

    vec = [ufhe.encrypt_integer(jax.random.fold_in(KEY, 50 + v), v, 4, False,
                                priv, ctx) for v in (9, 4, 7, 2)]
    sel1 = ufhe.encrypt_integer(jax.random.fold_in(KEY, 41), 2, 2, False,
                                priv, ctx)
    out = ufhe.mux_integer_array(sel1, vec, 2, ctx)
    assert ufhe.decrypt_integer(out, priv, ctx) == 7


def test_batched_integers(ctx_keys):
    """A batch of integer pairs flows through add/cmp in one call; every
    element decrypts (the TPU-first batching the reference lacks)."""
    import numpy as np
    import jax.numpy as jnp
    from mosfhet_tpu import tlwe, torus
    priv, ctx = ctx_keys
    B = 3
    vals_a = [5, 11, 2]
    vals_b = [7, 3, 2]
    prec = 4
    d = ufhe._n_digits(prec, ctx)
    mask = ctx.torus_base - 1
    lt = ctx.log_torus_base

    def enc(vals, seed):
        digs = jnp.stack([(jnp.asarray(vals) >> (i * lt)) & mask
                          for i in range(d)])
        c = tlwe.encrypt(ufhe._digit_torus(digs, ctx), priv.extracted,
                         jax.random.fold_in(KEY, seed))
        return ufhe.Integer(digits=c, signed=False)

    a = enc(vals_a, 70)
    b = enc(vals_b, 71)
    s = ufhe.add_integer(a, b, d + 1, ctx)
    ph = tlwe.phase(s.digits, priv.extracted)          # [d+1, B]
    vals = np.asarray(jnp.round(
        torus.torus2double(ph) * (2 * ctx.torus_base)).astype(jnp.int64)
        % ctx.torus_base)
    got = np.zeros(B, np.int64)
    for i in range(vals.shape[0] - 1, -1, -1):
        got = (got << lt) | vals[i]
    np.testing.assert_array_equal(
        got, np.asarray(vals_a) + np.asarray(vals_b))
    c = ufhe.cmp_integer(a, b, ctx)
    phc = tlwe.phase(c.digits, priv.extracted)[0]
    gotc = np.asarray(jnp.round(
        torus.torus2double(phc) * (2 * ctx.torus_base)).astype(jnp.int64)
        % ctx.torus_base)
    np.testing.assert_array_equal(gotc, [0, 2, 1])     # <, >, ==


def test_keyset_io_roundtrip(ctx_keys, tmp_path):
    """ufhe keyset serialization (`applications/multi-ciphertext-arith/
    src/io.c` ships keyset IO in the reference): PrivKeyset, Context
    (embedding PublicKeyset) and an encrypted Integer survive the native
    versioned save/load byte-exactly, and the loaded keyset decrypts."""
    import numpy as np
    from mosfhet_tpu import io as mio
    priv, ctx = ctx_keys
    c = ufhe.encrypt_integer(jax.random.fold_in(KEY, 90), 11, 4, False, priv,
                             ctx)
    for name, obj in (("priv", priv), ("ctx", ctx), ("int", c)):
        path = tmp_path / f"{name}.mtpu"
        mio.save(path, obj)
        back = mio.load(path)
        la, ta = jax.tree_util.tree_flatten(obj)
        lb, tb = jax.tree_util.tree_flatten(back)
        assert ta == tb, f"{name}: treedef (static fields) mismatch"
        for a_, b_ in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    back_priv = mio.load(tmp_path / "priv.mtpu")
    back_ctx = mio.load(tmp_path / "ctx.mtpu")
    back_c = mio.load(tmp_path / "int.mtpu")
    assert ufhe.decrypt_integer(back_c, back_priv, back_ctx) == 11
