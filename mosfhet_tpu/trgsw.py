"""TRGSW: gadget ciphertexts and the external product — the PBS hot kernel.

Mirrors `src/trgsw.c` and `src/register.c`.  A TRGSW is (k+1)*l TRLWE rows
stored as one dense tensor; row r = comp*l + digit encrypts m * X^e * h_digit
added at component `comp` (`trgsw_monomial_sample`, `trgsw.c:152-168`).

The external product (`trgsw_mul_trlwe_DFT`, `trgsw.c:385-423`) is fused
batched tensor algebra here:

    digits   = gadget-decompose(TRLWE)          [..., J, N]     (J=(k+1)l)
    spectrum = NTT(digits)                      [..., J, P, N]
    acc      = sum_J spectrum * KEY             [..., k+1, P, N]
    out      = CRT-iNTT(acc)                    TRLWE

All arithmetic exact; the TRGSW-in-NTT-form carries Shoup companions so the
accumulation is multiply-shift only.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from . import ntt as _ntt
from . import polynomial as _poly
from . import trlwe as _trlwe
from .trlwe import TRLWE, TRLWEDFT, TRLWEKey, from_stacked
from .torus import TORUS_DTYPE, TORUS_BITS


@flax.struct.dataclass
class TRGSWKey:
    trlwe_key: TRLWEKey
    l: int = flax.struct.field(pytree_node=False)
    Bg_bit: int = flax.struct.field(pytree_node=False)

    def plan(self):
        """Plan for external products: J=(k+1)l digit convolutions with
        |digit| <= Bg/2 against centered torus operands (2x headroom for
        the rotation-free CMUX step, `ntt.external_product_bound`)."""
        k = self.trlwe_key.k
        bound = _ntt.external_product_bound(
            self.trlwe_key.N, self.Bg_bit, self.l, k)
        return _ntt.get_plan(self.trlwe_key.N, _ntt.primes_for_bound(bound, self.trlwe_key.N))


def new_key(trlwe_key: TRLWEKey, l: int, Bg_bit: int) -> TRGSWKey:
    return TRGSWKey(trlwe_key=trlwe_key, l=l, Bg_bit=Bg_bit)


@flax.struct.dataclass
class TRGSW:
    """rows[..., r, c, N]: r = comp*l + digit in [0,(k+1)l), c in [0,k+1)
    (component axis, b last)."""
    rows: jax.Array
    l: int = flax.struct.field(pytree_node=False)
    Bg_bit: int = flax.struct.field(pytree_node=False)

    @property
    def k(self):
        return self.rows.shape[-2] - 1

    @property
    def N(self):
        return self.rows.shape[-1]


@flax.struct.dataclass
class TRGSWDFT:
    """NTT-form TRGSW with Shoup companions: [..., r, c, P, N]."""
    v: jax.Array
    vs: jax.Array | None
    l: int = flax.struct.field(pytree_node=False)
    Bg_bit: int = flax.struct.field(pytree_node=False)
    primes: tuple = flax.struct.field(pytree_node=False)

    @property
    def k(self):
        return self.v.shape[-3] - 1

    @property
    def N(self):
        return self.v.shape[-1]

    def plan(self):
        return _ntt.get_plan(self.N, self.primes)


def _gadget_values(l: int, Bg_bit: int):
    return jnp.array(
        [1 << (TORUS_BITS - (i + 1) * Bg_bit) for i in range(l)],
        dtype=TORUS_DTYPE,
    )


def _add_monomial_rows(rows, m, e, l, Bg_bit, k, N):
    """rows[comp*l + i, comp] += m * h_i * X^(e mod N) with sign folding
    (`trgsw.c:152-168`).  m, e are Python ints or scalar arrays."""
    m = jnp.asarray(m, jnp.int64)
    e = jnp.asarray(e, jnp.int32)
    m = jnp.where((e & N) != 0, -m, m)
    e = e & (N - 1)
    h = _gadget_values(l, Bg_bit) * m.astype(TORUS_DTYPE)       # [l]
    onehot = (jnp.arange(N, dtype=jnp.int32) == e).astype(TORUS_DTYPE)
    r = jnp.arange((k + 1) * l) // l                            # comp of row
    c = jnp.arange(k + 1)
    sel = (r[:, None] == c[None, :]).astype(TORUS_DTYPE)        # [R, k+1]
    hh = jnp.tile(h, k + 1)                                     # h per row
    return rows + sel[..., None] * hh[:, None, None] * onehot


def monomial_encrypt(m, e, key: TRGSWKey, rkey) -> TRGSW:
    """TRGSW(m * X^e) (`trgsw_monomial_sample`, `trgsw.c:152-175`)."""
    l, Bg_bit = key.l, key.Bg_bit
    k, N = key.trlwe_key.k, key.trlwe_key.N
    R = (k + 1) * l
    zeros = _trlwe.encrypt(jnp.zeros((R, N), TORUS_DTYPE), key.trlwe_key, rkey)
    rows = zeros.stacked()                                      # [R, k+1, N]
    rows = _add_monomial_rows(rows, m, e, l, Bg_bit, k, N)
    return TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)


def encrypt(m, key: TRGSWKey, rkey) -> TRGSW:
    return monomial_encrypt(m, 0, key, rkey)


def noiseless_trivial(m, l: int, Bg_bit: int, k: int, N: int) -> TRGSW:
    """(`trgsw_noiseless_trivial_sample`, `trgsw.c:130-148`)."""
    rows = jnp.zeros(((k + 1) * l, k + 1, N), TORUS_DTYPE)
    rows = _add_monomial_rows(rows, m, 0, l, Bg_bit, k, N)
    return TRGSW(rows=rows, l=l, Bg_bit=Bg_bit)


def to_dft(g: TRGSW, plan: _ntt.NTTPlan, with_shoup: bool = True) -> TRGSWDFT:
    v = _ntt.to_ntt_u64(g.rows, plan)
    vs = _ntt.make_shoup(v, plan.p[:, None]) if with_shoup else None
    return TRGSWDFT(v=v, vs=vs, l=g.l, Bg_bit=g.Bg_bit, primes=plan.primes)


def from_dft(g: TRGSWDFT) -> TRGSW:
    return TRGSW(rows=_ntt.from_ntt_u64(g.v, g.plan()),
                 l=g.l, Bg_bit=g.Bg_bit)


# --- linear ops (`trgsw.c:275-342`) -----------------------------------------

def add(g1: TRGSW, g2: TRGSW) -> TRGSW:
    return TRGSW(rows=g1.rows + g2.rows, l=g1.l, Bg_bit=g1.Bg_bit)


def sub(g1: TRGSW, g2: TRGSW) -> TRGSW:
    return TRGSW(rows=g1.rows - g2.rows, l=g1.l, Bg_bit=g1.Bg_bit)


def dft_add(g1: TRGSWDFT, g2: TRGSWDFT) -> TRGSWDFT:
    plan = g1.plan()
    return TRGSWDFT(v=_ntt.add(g1.v, g2.v, plan), vs=None,
                    l=g1.l, Bg_bit=g1.Bg_bit, primes=g1.primes)


def dft_sub(g1: TRGSWDFT, g2: TRGSWDFT) -> TRGSWDFT:
    plan = g1.plan()
    return TRGSWDFT(v=_ntt.sub(g1.v, g2.v, plan), vs=None,
                    l=g1.l, Bg_bit=g1.Bg_bit, primes=g1.primes)


def mul_by_xai(g: TRGSW, a) -> TRGSW:
    a_arr = jnp.asarray(a)
    return TRGSW(rows=_poly.mul_by_xai(g.rows, a_arr[..., None, None]),
                 l=g.l, Bg_bit=g.Bg_bit)


def mul_by_xai_minus_1(g: TRGSW, a) -> TRGSW:
    a_arr = jnp.asarray(a)
    return TRGSW(rows=_poly.mul_by_xai_minus_1(g.rows, a_arr[..., None, None]),
                 l=g.l, Bg_bit=g.Bg_bit)


# --- the external product -----------------------------------------------------

def _pallas_ep_eligible(g: TRGSWDFT) -> bool:
    from .ops.pbs_kernel import kernel_eligible
    return kernel_eligible(g.N, g.primes)


def _external_product_pallas(c: TRLWE, g: TRGSWDFT,
                             interpret: bool = False) -> TRLWE:
    """One fused-kernel external product: the apply kernel with a single
    scan step (replace mode IS the product)."""
    from .ops import pbs_kernel as _pk
    k, N = g.k, g.N
    kp = _pk.get_kernel_plan(N, g.primes, g.l, g.Bg_bit, k)
    st = c.stacked()
    batch = jnp.broadcast_shapes(st.shape[:-2], g.v.shape[:-4])
    st = jnp.broadcast_to(st, batch + st.shape[-2:])
    B = 1
    for d in batch:
        B *= d
    x = st.reshape(B, k + 1, N)
    pad = (-B) % kp.bt
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    per_row = g.v.ndim > 4
    g32 = g.v.astype(jnp.uint32)
    if per_row:
        gv = jnp.broadcast_to(g32, batch + g32.shape[-4:]) \
                .reshape(B, *g32.shape[-4:])
        if pad:
            gv = jnp.concatenate(
                [gv, jnp.zeros((pad,) + gv.shape[1:], gv.dtype)], axis=0)
        sa = gv[None]                                   # [G=1, B', J, C, P, N]
    else:
        sa = g32[None]                                  # [G=1, J, C, P, N]
    out = _pk.ext_product_apply_scan(x, sa, kp, per_row=per_row,
                                     interpret=interpret)
    out = out[:B] if pad else out
    return from_stacked(out.reshape(batch + (k + 1, N)))


def external_product(c: TRLWE, g: TRGSWDFT, impl: str = "auto") -> TRLWE:
    """TRGSW (x) TRLWE — the hot kernel (`trgsw_mul_trlwe_DFT`,
    `trgsw.c:385-423`).  Batched over leading axes of both operands.

    impl "auto" uses the fused Pallas apply kernel on TPU (Barrett
    multiplies against g's residues; bit-identical to the jnp path),
    jnp elsewhere."""
    if impl == "auto":
        impl = "pallas" if _pallas_ep_eligible(g) else "jnp"
    if impl in ("pallas", "pallas_interpret"):
        return _external_product_pallas(
            c, g, interpret=(impl == "pallas_interpret"))
    plan = g.plan()
    digits = _trlwe.decompose(c, g.Bg_bit, g.l)                 # [..., J, N]
    spec = _ntt.to_ntt_small(digits, plan)                      # [..., J, P, N]
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], g.v, g.vs, plan, axis=-4
    )                                                           # [..., k+1, P, N]
    return from_stacked(_ntt.from_ntt_u64(acc, plan))


def external_product_dft(c: TRLWE, g: TRGSWDFT) -> TRLWEDFT:
    """Same, but leave the accumulator in NTT domain (callers that add
    several products before converting)."""
    plan = g.plan()
    digits = _trlwe.decompose(c, g.Bg_bit, g.l)
    spec = _ntt.to_ntt_small(digits, plan)
    acc = _ntt.pointwise_mul_acc_key(
        spec[..., :, None, :, :], g.v, g.vs, plan, axis=-4
    )
    return TRLWEDFT(v=acc, vs=None, primes=g.primes)


def mul_trgsw_dft(g1: TRGSW, g2: TRGSWDFT) -> TRGSWDFT:
    """TRGSW x TRGSW: external product row-by-row (`trgsw_mul_DFT`,
    `trgsw.c:425-431`).  Rows become a batch axis — one fused call."""
    rows = from_stacked(g1.rows)            # TRLWE with batch axis R
    out = external_product_dft(rows, g2)    # [..., R, k+1, P, N]
    return TRGSWDFT(v=out.v, vs=None, l=g1.l, Bg_bit=g1.Bg_bit,
                    primes=g2.primes)


def mul_trgsw_dft2(g1: TRGSWDFT, g2: TRGSWDFT) -> TRGSWDFT:
    """TRGSW x TRGSW with both operands in NTT form: convert g1 back to
    time domain, then the row-wise external product (`trgsw_mul_DFT2`,
    `trgsw.c:433-442`)."""
    return mul_trgsw_dft(from_dft(g1), g2)


def ks_b_to_a(g: TRGSW, ksk_pair) -> TRGSW:
    """Rebuild the component-0 (a-side) rows of a TRGSW from its
    component-1 (b-side) rows via the TRLWE private-KS pair
    (`trgsw_ks_b_to_a`, `trgsw.c:479-483`).  k must be 1."""
    from . import keyswitch as _ks
    l = g.l
    assert g.k == 1, "ks_b_to_a mirrors the reference's k=1 layout"
    b_rows = from_stacked(g.rows[..., l:2 * l, :, :])     # TRLWE, batch [.., l]
    a_rows = _ks.priv_keyswitch_2(b_rows, ksk_pair)
    rows = jnp.concatenate(
        [a_rows.stacked(), g.rows[..., l:2 * l, :, :]], axis=-3)
    return TRGSW(rows=rows, l=l, Bg_bit=g.Bg_bit)


def debug_decrypt_exp(g: TRGSW, key: TRGSWKey):
    """Decrypt the exponent of a TRGSW(X^e): scan the phase of row `l`
    (digit 0 of the b component) for the unique above-threshold monomial
    (`_debug_trgsw_decrypt_exp_sample`, `trgsw.c:189-216`).

    Returns int32 e in [0, N) or -1 (none or ambiguous) — the reference's
    test oracle for register/GA exponent arithmetic.  Batched over leading
    axes of g."""
    l, Bg_bit = g.l, g.Bg_bit
    row = from_stacked(g.rows[..., l, :, :])              # TRLWE row l
    ph = _trlwe.phase(row, key.trlwe_key)                 # [..., N]
    delta = TORUS_DTYPE(1 << (TORUS_BITS - 1 - Bg_bit))
    mask = (ph > delta) & (ph < (TORUS_DTYPE(0) - delta))
    count = jnp.sum(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    return jnp.where(count == 1, idx, jnp.int32(-1))


def debug_decrypt_exp_dft(g: TRGSWDFT, key: TRGSWKey):
    """Exponent decrypt for NTT-form TRGSW: external product against a
    trivial TRLWE(h X^0) then the same unique-monomial scan
    (`_debug_trgsw_decrypt_exp_DFT_sample`, `trgsw.c:240-268`)."""
    k, N = key.trlwe_key.k, key.trlwe_key.N
    Bg_bit = g.Bg_bit
    b = jnp.zeros((N,), TORUS_DTYPE).at[0].set(
        TORUS_DTYPE(1 << (TORUS_BITS - Bg_bit)))
    tmp = _trlwe.noiseless_trivial(b, k, N)
    gg = g if g.vs is not None else _with_shoup(g)
    res = external_product(tmp, gg)
    ph = _trlwe.phase(res, key.trlwe_key)
    delta = TORUS_DTYPE(1 << (TORUS_BITS - 1 - Bg_bit))
    mask = (ph > delta) & (ph < (TORUS_DTYPE(0) - delta))
    count = jnp.sum(mask, axis=-1)
    idx = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    return jnp.where(count == 1, idx, jnp.int32(-1))


def naive_mul_trlwe(c: TRLWE, g: TRGSW) -> TRLWE:
    """O(N^2) oracle (`trgsw_naive_mul_trlwe`, `trgsw.c:452-470`).
    Test-only."""
    digits = _trlwe.decompose(c, g.Bg_bit, g.l, rounded=False)
    d64 = digits.astype(jnp.int64).astype(TORUS_DTYPE)          # [..., J, N]
    prods = _poly.naive_negacyclic_mul(d64[..., :, None, :], g.rows)
    return from_stacked(jnp.sum(prods, axis=-3, dtype=TORUS_DTYPE))


# --- TRGSW registers (`src/register.c`) ----------------------------------------

@flax.struct.dataclass
class TRGSWReg:
    """Pair (positive, negative) of TRGSW-DFT encrypting X^m and X^-m
    (`register.c`, `mosfhet.h:123-127`)."""
    positive: TRGSWDFT
    negative: TRGSWDFT


def reg_encrypt(m: int, key: TRGSWKey, rkey) -> TRGSWReg:
    k1, k2 = jax.random.split(rkey)
    plan = key.plan()
    pos = to_dft(monomial_encrypt(1, m, key, k1), plan)
    neg_ = to_dft(monomial_encrypt(1, -m, key, k2), plan)
    return TRGSWReg(positive=pos, negative=neg_)


def reg_add(r1: TRGSWReg, r2: TRGSWReg) -> TRGSWReg:
    """X^(m1+m2) via TRGSW x TRGSW products (`register.c:46-58`)."""
    p = mul_trgsw_dft(from_dft(r1.positive), r2.positive)
    n = mul_trgsw_dft(from_dft(r1.negative), r2.negative)
    return TRGSWReg(positive=_with_shoup(p), negative=_with_shoup(n))


def reg_sub(r1: TRGSWReg, r2: TRGSWReg) -> TRGSWReg:
    """X^(m1-m2) (`register.c:60-71`)."""
    p = mul_trgsw_dft(from_dft(r1.positive), r2.negative)
    n = mul_trgsw_dft(from_dft(r1.negative), r2.positive)
    return TRGSWReg(positive=_with_shoup(p), negative=_with_shoup(n))


def _with_shoup(g: TRGSWDFT) -> TRGSWDFT:
    plan = g.plan()
    return TRGSWDFT(v=g.v, vs=_ntt.make_shoup(g.v, plan.p[:, None]),
                    l=g.l, Bg_bit=g.Bg_bit, primes=g.primes)
