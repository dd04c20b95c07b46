"""ufhe: radix-B encrypted integer arithmetic on top of the PBS
(`applications/multi-ciphertext-arith/`).

Integers are vectors of TLWE digits in base `torus_base` (digit v encoded as
v/(2*torus_base) on the torus).  Add/sub propagate bootstrapped carries;
multiplication builds per-digit mulmod/mulquo LUTs via the factorized
multi-value bootstrap and packs them with the LUT-packing keyswitch;
comparison chains bootstraps; ReLU selects on the sign digit.

Digits live on a leading axis of one TLWE, so every per-digit primitive is
already a batched TPU kernel.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .. import bootstrap as _bs
from .. import keyswitch as _ks
from .. import tlwe as _tlwe
from .. import trgsw as _trgsw
from .. import trlwe as _trlwe
from ..params import TFHEParams, UFHE_SET0
from ..tlwe import TLWE
from ..trlwe import TRLWE
from ..torus import TORUS_DTYPE, double2torus, torus2double


import flax.struct


@flax.struct.dataclass
class PrivKeyset:
    """(`ufhe_new_priv_keyset`, `ufhe.c:22-32`).  A PyTree, so whole
    encrypted-integer operations are jittable with the keyset as an
    argument."""
    tlwe: object
    trlwe: object
    extracted: object
    trgsw: object
    params: TFHEParams = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class PublicKeyset:
    """(`ufhe_new_public_keyset`, `ufhe.c:34-42`)."""
    bootstrap_key: object
    packing_key: object
    ks_key: object
    params: TFHEParams = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class Context:
    """Precomputed LUTs + multiplication matrices
    (`ufhe_setup_context`, `ufhe.c:44-94`)."""
    keyset: PublicKeyset
    addsub_lut: TRLWE
    signextend_lut: TRLWE
    torus_base: int = flax.struct.field(pytree_node=False)
    log_torus_base: int = flax.struct.field(pytree_node=False)
    mulmod: tuple = flax.struct.field(pytree_node=False)
    mulquo: tuple = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class Integer:
    """d base-B digits, little-endian, as one TLWE with leading [d] axis."""
    digits: TLWE
    signed: bool = flax.struct.field(pytree_node=False)

    @property
    def d(self):
        return self.digits.b.shape[0]


def new_priv_keyset(rkey, params: TFHEParams = UFHE_SET0) -> PrivKeyset:
    k0, k1 = jax.random.split(rkey)
    key_tlwe = _tlwe.new_binary_key(k0, params.n, params.lwe_sigma)
    key_trlwe = _trlwe.new_binary_key(k1, params.N, params.k,
                                      params.rlwe_sigma)
    extracted = _trlwe.extract_tlwe_key(key_trlwe)
    # the reference gives the extracted key the LWE sigma (`ufhe.c:28`)
    extracted = _tlwe.TLWEKey(s=extracted.s, sigma=params.lwe_sigma)
    gk = _trgsw.new_key(key_trlwe, params.l, params.Bg_bit)
    return PrivKeyset(tlwe=key_tlwe, trlwe=key_trlwe, extracted=extracted,
                      trgsw=gk, params=params)


def new_public_keyset(rkey, priv: PrivKeyset,
                      torus_base: int = 4) -> PublicKeyset:
    p = priv.params
    k0, k1, k2 = jax.random.split(rkey, 3)
    # jit each keygen: un-jitted eager dispatch materializes every NTT
    # intermediate of these multi-GB tables (HBM OOM at production params)
    bk = jax.jit(lambda r, tk: _bs.new_key(r, priv.trgsw, tk, 1))(
        k0, priv.tlwe)
    ksk = jax.jit(lambda r, ok, ik: _tlwe.new_ks_key(
        r, ok, ik, p.t, p.base_bit))(k1, priv.tlwe, priv.extracted)
    pk = jax.jit(lambda r, ok, ik: _ks.new_lut_packing_ks_key(
        r, ok, ik, p.t, p.base_bit, torus_base))(k2, priv.trlwe,
                                                 priv.extracted)
    return PublicKeyset(bootstrap_key=bk, packing_key=pk, ks_key=ksk,
                        params=p)


def setup_context(keyset: PublicKeyset) -> Context:
    tb = keyset.packing_key.torus_base
    log_tb = int(math.log2(tb))
    p = keyset.params
    addsub = _trlwe.torus_packing(
        jnp.array([double2torus(-1.0 / (4 * tb))], TORUS_DTYPE), p.k, p.N)
    se_vals = jnp.concatenate([
        jnp.zeros((tb // 2,), TORUS_DTYPE),
        jnp.full((tb - tb // 2,),
                 double2torus((tb - 1) / (2 * tb)), TORUS_DTYPE),
    ])
    signextend = _trlwe.torus_packing(se_vals, p.k, p.N)
    mulmod = tuple(tuple((i * j) % tb for j in range(tb)) for i in range(tb))
    mulquo = tuple(tuple((i * j) // tb for j in range(tb)) for i in range(tb))
    return Context(keyset=keyset, torus_base=tb, log_torus_base=log_tb,
                   addsub_lut=addsub, signextend_lut=signextend,
                   mulmod=mulmod, mulquo=mulquo)


# --- integer construction / (de)cryption (`integer.c:5-53`) ------------------

def _n_digits(precision: int, ctx: Context) -> int:
    lt = ctx.log_torus_base
    return precision // lt + (1 if precision % lt else 0)


def _digit_torus(vals, ctx: Context):
    return double2torus(jnp.asarray(vals, jnp.float64) / (2 * ctx.torus_base))


def cleartext_integer(value: int, precision: int, signed: bool,
                      ctx: Context) -> Integer:
    d = _n_digits(precision, ctx)
    mask = ctx.torus_base - 1
    digs = [(value >> (i * ctx.log_torus_base)) & mask for i in range(d)]
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    c = _tlwe.noiseless_trivial(_digit_torus(digs, ctx), n_out)
    return Integer(digits=c, signed=signed)


def encrypt_integer(rkey, value: int, precision: int, signed: bool,
                    priv: PrivKeyset, ctx: Context) -> Integer:
    d = _n_digits(precision, ctx)
    mask = ctx.torus_base - 1
    digs = [(value >> (i * ctx.log_torus_base)) & mask for i in range(d)]
    c = _tlwe.encrypt(_digit_torus(digs, ctx), priv.extracted, rkey)
    return Integer(digits=c, signed=signed)


def decrypt_integer(c: Integer, priv: PrivKeyset, ctx: Context) -> int:
    ph = _tlwe.phase(c.digits, priv.extracted)
    vals = jnp.round(torus2double(ph) * (2 * ctx.torus_base)).astype(jnp.int64)
    vals = vals % ctx.torus_base
    result = 0
    for i in range(c.d - 1, -1, -1):
        result = (result << ctx.log_torus_base) | int(vals[i])
    if c.signed:
        bits = ctx.log_torus_base * c.d
        if result >= 1 << (bits - 1):
            result -= 1 << bits
    return result


def _digit(c: Integer, i: int) -> TLWE:
    return TLWE(a=c.digits.a[i], b=c.digits.b[i])


def _set_digit(c: Integer, i: int, v: TLWE) -> Integer:
    return Integer(digits=TLWE(a=c.digits.a.at[i].set(v.a),
                               b=c.digits.b.at[i].set(v.b)),
                   signed=c.signed)


def _batch_of(*ints) -> tuple:
    """Leading batch dims of the digit axis (digits are [d, *batch])."""
    shapes = [c.digits.b.shape[1:] for c in ints]
    return jnp.broadcast_shapes(*shapes) if shapes else ()


def _zero_int(d: int, signed: bool, ctx: Context, batch=()) -> Integer:
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    z = _tlwe.noiseless_trivial(jnp.zeros((d,) + tuple(batch), TORUS_DTYPE),
                                n_out)
    return Integer(digits=z, signed=signed)


def _carry_bootstrap(digit: TLWE, ctx: Context) -> TRLWE:
    """keyswitch to n + rotate the ADDSUB test vector — the shared step of
    add/sub carry propagation (`integer.c:94-95`)."""
    tmp = _tlwe.keyswitch(digit, ctx.keyset.ks_key)
    return _bs.functional_bootstrap_wo_extract(
        ctx.addsub_lut, tmp, ctx.keyset.bootstrap_key, ctx.torus_base)


def extend_integer(c: Integer, old_precision: int, ctx: Context) -> Integer:
    """Zero- or sign-extend (`ufhe_extend_integer`, `integer.c:62-76`)."""
    d_ini = old_precision // ctx.log_torus_base
    if not c.signed:
        for i in range(d_ini, c.d):
            c = _set_digit(c, i, _tlwe.noiseless_trivial(
                TORUS_DTYPE(0), c.digits.a.shape[-1]))
        return c
    if c.d <= d_ini:
        return c
    tmp = _tlwe.keyswitch(_digit(c, d_ini - 1), ctx.keyset.ks_key)
    acc = _bs.functional_bootstrap_wo_extract(
        ctx.signextend_lut, tmp, ctx.keyset.bootstrap_key, ctx.torus_base)
    ext = _trlwe.mv_extract_tlwe(acc, c.d - d_ini)
    for i, e in enumerate(ext):
        c = _set_digit(c, d_ini + i, e)
    return c


def sl_add_integer(a: Integer, g: int, b: Integer, h: int, out_d: int,
                   ctx: Context) -> Integer:
    """c = a*B^g + b*B^h with bootstrapped carries
    (`ufhe_sl_add_integer`, `integer.c:79-107`)."""
    signed = a.signed or b.signed
    size = a.d if signed else min(max(a.d + g, b.d + h) + 1, out_d)
    c = _zero_int(out_d, signed, ctx, _batch_of(a, b))
    quarter = double2torus(0.25)
    carry_init = double2torus(1.0 / (ctx.torus_base * 4))
    for i in range(size):
        di = _digit(c, i)
        if 0 <= i - g < a.d:
            di = _tlwe.add(di, _digit(a, i - g))
        if 0 <= i - h < b.d:
            di = _tlwe.add(di, _digit(b, i - h))
        c = _set_digit(c, i, di)
        if i - g < 0 or i - h < 0:
            continue
        acc = _carry_bootstrap(di, ctx)
        delta = _trlwe.mv_extract_tlwe_scaling_delta(acc, ctx.torus_base)
        di = _tlwe.sub(di, delta)
        di = TLWE(a=di.a, b=di.b - quarter)
        c = _set_digit(c, i, di)
        if i != size - 1:
            carry = _trlwe.mv_extract_tlwe_scaling_delta(acc, 1)
            nxt = _tlwe.TLWE(a=carry.a, b=carry.b + carry_init)
            c = _set_digit(c, i + 1, nxt)
    return extend_integer(c, size * ctx.log_torus_base, ctx)


def add_integer(a: Integer, b: Integer, out_d: int, ctx: Context) -> Integer:
    return sl_add_integer(a, 0, b, 0, out_d, ctx)


def sl_addto_integer(b: Integer, a: Integer, g: int, ctx: Context) -> Integer:
    """b += a*B^g (`ufhe_sl_addto_integer`, `integer.c:110-132`)."""
    signed = a.signed or b.signed
    size = a.d if signed else min(a.d + g + 1, b.d)
    quarter = double2torus(0.25)
    carry_init = double2torus(1.0 / (ctx.torus_base * 4))
    for i in range(size):
        di = _digit(b, i)
        if 0 <= i - g < a.d:
            di = _tlwe.add(di, _digit(a, i - g))
            b = _set_digit(b, i, di)
        if i - g < 0:
            continue
        acc = _carry_bootstrap(di, ctx)
        delta = _trlwe.mv_extract_tlwe_scaling_delta(acc, ctx.torus_base)
        di = _tlwe.sub(di, delta)
        di = TLWE(a=di.a, b=di.b - quarter)
        b = _set_digit(b, i, di)
        if i != size - 1:
            nxt = _digit(b, i + 1)
            carry = _trlwe.mv_extract_tlwe_scaling_delta(acc, 1)
            nxt = _tlwe.add(nxt, carry)
            nxt = TLWE(a=nxt.a, b=nxt.b + carry_init)
            b = _set_digit(b, i + 1, nxt)
    return b


def sub_integer(a: Integer, b: Integer, out_d: int, ctx: Context) -> Integer:
    """c = a - b (`ufhe_sub_integer`, `integer.c:135-155`)."""
    c = _zero_int(out_d, a.signed or b.signed, ctx, _batch_of(a, b))
    quarter = double2torus(0.25)
    carry_init = double2torus(1.0 / (ctx.torus_base * 4))
    for i in range(out_d):
        di = _digit(c, i)
        if i < a.d:
            di = _tlwe.add(di, _digit(a, i))
        if i < b.d:
            di = _tlwe.sub(di, _digit(b, i))
        acc = _carry_bootstrap(di, ctx)
        delta = _trlwe.mv_extract_tlwe_scaling_delta(acc, ctx.torus_base)
        di = _tlwe.add(di, delta)
        di = TLWE(a=di.a, b=di.b + quarter)
        c = _set_digit(c, i, di)
        if i != out_d - 1:
            carry = _trlwe.mv_extract_tlwe_scaling_delta(acc, 1)
            nxt = _tlwe.neg(carry)
            nxt = TLWE(a=nxt.a, b=nxt.b - carry_init)
            c = _set_digit(c, i + 1, nxt)
    return c


def neg_integer(a: Integer, ctx: Context) -> Integer:
    """(`ufhe_neg_integer`, `integer.c:157-165`)."""
    half = double2torus(0.5)
    dig_off = double2torus(1.0 / (2 * ctx.torus_base))
    out = _tlwe.neg(a.digits)
    b = out.b + half
    b = b.at[1:].add(TORUS_DTYPE(0) - dig_off)
    return Integer(digits=TLWE(a=out.a, b=b), signed=a.signed)


def mul_integer(a: Integer, b: Integer, out_d: int, ctx: Context) -> Integer:
    """Schoolbook multiplication with per-digit mulmod/mulquo LUTs built by
    the factorized multi-value bootstrap (`ufhe_mul_integer`,
    `integer.c:167-215`)."""
    signed = a.signed or b.signed
    size = a.d if signed else min(a.d + b.d + 1, out_d)
    tb, log_tb = ctx.torus_base, ctx.log_torus_base
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    batch = _batch_of(a, b)
    c = _zero_int(out_d, signed, ctx, batch)
    for i in range(a.d):
        sel = _tlwe.keyswitch(_digit(a, i), ctx.keyset.ks_key)
        mv_tv = _bs.multivalue_bootstrap_phase1(
            sel, ctx.keyset.bootstrap_key, tb)
        zero = _tlwe.noiseless_trivial(
            jnp.zeros(tuple(batch), TORUS_DTYPE), n_out)
        lut_mod = [zero, _digit(a, i)]
        lut_quo = [zero, zero]
        for j in range(2, tb):
            lut_mod.append(_bs.multivalue_bootstrap_phase2(
                ctx.mulmod[j], mv_tv, tb, log_tb))
            lut_quo.append(_bs.multivalue_bootstrap_phase2(
                ctx.mulquo[j], mv_tv, tb, log_tb))
        mod_tv = _ks.lut_packing_keyswitch(_stack_tlwe(lut_mod),
                                           ctx.keyset.packing_key)
        quo_tv = _ks.lut_packing_keyswitch(_stack_tlwe(lut_quo),
                                           ctx.keyset.packing_key)
        prod = _zero_int(b.d, signed, ctx, batch)
        carry = _zero_int(b.d, signed, ctx, batch)
        for j in range(b.d):
            if i + j >= size:
                break
            selb = _tlwe.keyswitch(_digit(b, j), ctx.keyset.ks_key)
            prod = _set_digit(prod, j, _bs.functional_bootstrap(
                mod_tv, selb, ctx.keyset.bootstrap_key, tb))
            carry = _set_digit(carry, j, _bs.functional_bootstrap(
                quo_tv, selb, ctx.keyset.bootstrap_key, tb))
        res = sl_add_integer(prod, 0, carry, 1,
                             b.d + (0 if signed else 1), ctx)
        c = sl_addto_integer(c, res, i, ctx)
    if c.signed:
        c = extend_integer(c, size * ctx.log_torus_base, ctx)
    return c


def _stack_tlwe(cs: list) -> TLWE:
    """Stack LUT entries on the axis `lut_packing_keyswitch` expects
    ([..., tb, n] — just before the mask axis), so batched digits keep
    their leading batch dims."""
    ash = jnp.broadcast_shapes(*[c.a.shape for c in cs])
    bsh = jnp.broadcast_shapes(*[c.b.shape for c in cs])
    return TLWE(a=jnp.stack([jnp.broadcast_to(c.a, ash) for c in cs],
                            axis=-2),
                b=jnp.stack([jnp.broadcast_to(c.b, bsh) for c in cs],
                            axis=-1))


def cmp_integer(a: Integer, b: Integer, ctx: Context) -> Integer:
    """c = 0 (a<b), 1 (a==b), 2 (a>b) (`ufhe_cmp_integer`,
    `integer.c:217-265`)."""
    tb = ctx.torus_base
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    size = max(a.d, b.d)
    batch = _batch_of(a, b)
    one = _tlwe.noiseless_trivial(
        jnp.broadcast_to(_digit_torus(1, ctx), tuple(batch)), n_out)
    c0 = _tlwe.noiseless_trivial(jnp.zeros(tuple(batch), TORUS_DTYPE), n_out)
    for i in range(size):
        if i < a.d and i < b.d:
            diff = _tlwe.sub(_digit(a, i), _digit(b, i))
        elif i < a.d:
            diff = _digit(a, i)
        else:
            diff = _tlwe.neg(_digit(b, i))
        sel = _tlwe.keyswitch(diff, ctx.keyset.ks_key)
        lut = _stack_tlwe([c0] + [one] * (tb - 1))
        tv = _ks.lut_packing_keyswitch(lut, ctx.keyset.packing_key)
        c0 = _bs.functional_bootstrap(tv, sel, ctx.keyset.bootstrap_key, tb)
    for key_int, signed_flag in ((a, a.signed), (b, b.signed)):
        if signed_flag:
            one = _tlwe.neg(c0)
            lut = _stack_tlwe([c0] * (tb // 2) + [one] * (tb - tb // 2))
            tv = _ks.lut_packing_keyswitch(lut, ctx.keyset.packing_key)
            sel = _tlwe.keyswitch(_digit(key_int, key_int.d - 1),
                                  ctx.keyset.ks_key)
            c0 = _bs.functional_bootstrap(tv, sel, ctx.keyset.bootstrap_key,
                                          tb)
    c0 = TLWE(a=c0.a, b=c0.b + _digit_torus(1, ctx))
    out = _zero_int(1, False, ctx, batch)
    return _set_digit(out, 0, c0)


def encrypted_tlwe_lut(selector: Integer, lut: list, ctx: Context) -> TLWE:
    """lut[0] = lut[selector] via a bootstrapped LUT tree
    (`ufhe_encrypted_tlwe_lut`, `lut.c:6-21`)."""
    tb = ctx.torus_base
    size = len(lut)
    i = 0
    while size > 1:
        sel = _tlwe.keyswitch(_digit(selector, i), ctx.keyset.ks_key)
        nxt = []
        for j in range(size // tb):
            tv = _ks.lut_packing_keyswitch(
                _stack_tlwe(lut[j * tb:(j + 1) * tb]), ctx.keyset.packing_key)
            nxt.append(_bs.functional_bootstrap(
                tv, sel, ctx.keyset.bootstrap_key, tb))
        lut = nxt
        size //= tb
        i += 1
    return lut[0]


def lut_integer(selector: Integer, lut_values, size: int, out_d: int,
                ctx: Context) -> Integer:
    """Cleartext integer LUT eval (`ufhe_lut_integer`, `lut.c:23-47`)."""
    tb, log_tb = ctx.torus_base, ctx.log_torus_base
    mask = tb - 1
    sel0 = _tlwe.keyswitch(_digit(selector, 0), ctx.keyset.ks_key)
    mv_tv = _bs.multivalue_bootstrap_phase1(sel0, ctx.keyset.bootstrap_key, tb)
    out = _zero_int(out_d, False, ctx, _batch_of(selector))
    for j in range(out_d):
        enc = []
        for i in range(size // tb):
            dec = [int(lut_values[i * tb + q] >> (j * log_tb)) & mask
                   for q in range(tb)]
            enc.append(_bs.multivalue_bootstrap_phase2(dec, mv_tv, tb, log_tb))
        rest = Integer(digits=TLWE(a=selector.digits.a[1:],
                                   b=selector.digits.b[1:]),
                       signed=False)
        out = _set_digit(out, j, encrypted_tlwe_lut(rest, enc, ctx))
    return out


def mux_integer_array(selector: Integer, vec: list, out_d: int,
                      ctx: Context) -> Integer:
    """out = vec[selector] (`ufhe_mux_integer_array`, `lut.c:49-64`)."""
    tb = ctx.torus_base
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    batch = _batch_of(selector, *vec)
    zero = _tlwe.noiseless_trivial(jnp.zeros(tuple(batch), TORUS_DTYPE),
                                   n_out)
    out = _zero_int(out_d, False, ctx, batch)
    for i in range(out_d):
        lut = [_digit(v, i) for v in vec]
        while len(lut) % tb:
            lut.append(zero)
        out = _set_digit(out, i, encrypted_tlwe_lut(selector, lut, ctx))
    return out


def relu_integer(a: Integer, ctx: Context) -> Integer:
    """out = a > 0 ? a : 0 (`ufhe_relu_integer`, `ml.c:4-21`)."""
    tb = ctx.torus_base
    n_out = ctx.keyset.params.k * ctx.keyset.params.N
    p = ctx.keyset.params
    sel = _tlwe.keyswitch(_digit(a, a.d - 1), ctx.keyset.ks_key)
    batch = _batch_of(a)
    zero = _tlwe.noiseless_trivial(jnp.zeros(tuple(batch), TORUS_DTYPE),
                                   n_out)
    out = _zero_int(a.d, a.signed, ctx, batch)
    for i in range(a.d - 1):
        lut = [_digit(a, i)] * (tb // 2) + [zero] * (tb - tb // 2)
        tv = _ks.lut_packing_keyswitch(_stack_tlwe(lut),
                                       ctx.keyset.packing_key)
        out = _set_digit(out, i, _bs.functional_bootstrap(
            tv, sel, ctx.keyset.bootstrap_key, tb))
    top_vals = jnp.concatenate([
        _digit_torus(jnp.arange(tb // 2), ctx),
        jnp.zeros((tb - tb // 2,), TORUS_DTYPE)])
    tv = _trlwe.torus_packing(top_vals, p.k, p.N)
    out = _set_digit(out, a.d - 1, _bs.functional_bootstrap(
        tv, sel, ctx.keyset.bootstrap_key, tb))
    return out
