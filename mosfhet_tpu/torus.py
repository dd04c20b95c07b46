"""Discretized-torus scalar helpers and gadget decomposition.

The torus T = R/Z is represented as an unsigned integer (value x means
x / 2^TORUS_BITS), matching the reference (`include/mosfhet.h:23-28`).
Like the reference's compile-time `-DTORUS32` flag (`Makefile.def:47-50`),
the torus width is selected at import time: set ``MOSFHET_TORUS_BITS=32``
in the environment for the u32 torus (default 64).  All arithmetic is
exact wraparound; helpers mirror `src/misc.c:9-28`.

The fused Pallas blind-rotate step kernel supports both widths (a 1-limb
tile under TORUS32, 2 limbs under the default u64 torus); only the
standalone `cmux_delta` entry point (GA-bootstrap path) is 64-bit-only.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

TORUS_BITS = int(os.environ.get("MOSFHET_TORUS_BITS", "64"))
assert TORUS_BITS in (32, 64), "MOSFHET_TORUS_BITS must be 32 or 64"
TORUS_DTYPE = jnp.uint64 if TORUS_BITS == 64 else jnp.uint32
SIGNED_DTYPE = jnp.int64 if TORUS_BITS == 64 else jnp.int32
_SCALE = float(1 << TORUS_BITS)
TORUS_MASK = (1 << TORUS_BITS) - 1


def _ut(x):
    return jnp.asarray(x, dtype=TORUS_DTYPE)


def torus2double(x):
    """torus -> float64 in [0, 1).  (`misc.c:9-11`)."""
    return _ut(x).astype(jnp.float64) / _SCALE


def double2torus(x):
    """float64 -> torus: round(frac(x) * 2^TORUS_BITS) via a hi/lo split.

    The reference's `(Torus)(int64_t)(x * 2^bits)` (`misc.c:13-15`) is UB at
    |x| >= 0.5 and saturates under XLA's cast; the split below is
    well-defined for all x and agrees with the C semantics wherever the C
    semantics are defined (the double's precision limits any difference to
    one torus ulp)."""
    x = jnp.asarray(x, jnp.float64)
    frac = x - jnp.floor(x)  # [0, 1)
    if TORUS_BITS == 32:
        return jnp.floor(frac * _SCALE).astype(jnp.int64).astype(TORUS_DTYPE)
    hi = jnp.floor(frac * 4294967296.0)
    lo = (frac * 4294967296.0 - hi) * 4294967296.0
    return ((hi.astype(jnp.uint64) << jnp.uint64(32))
            | lo.astype(jnp.uint64))


def torus2int(x, log_scale: int):
    """round(x * 2^log_scale) as integer (`misc.c:18-22`)."""
    x = _ut(x)
    round_offset = TORUS_DTYPE(1 << (TORUS_BITS - log_scale - 1))
    return (x + round_offset) >> TORUS_DTYPE(TORUS_BITS - log_scale)


def int2torus(x, log_scale: int):
    """integer -> torus multiple of 2^-log_scale (`misc.c:25-28`)."""
    return _ut(x) << TORUS_DTYPE(TORUS_BITS - log_scale)


def gadget_offset(Bg_bit: int, l: int, rounded: bool = True) -> int:
    """The decomposition offset constant.

    `polynomial_decompose_i` (`polynomial.c:74-89`, used on every hot path)
    includes a rounding half-bit below the last digit; `polynomial_decompose`
    (`polynomial.c:55-72`) does not.  ``rounded`` selects between them.
    """
    offset = 0
    for i in range(l):
        offset += 1 << (TORUS_BITS - i * Bg_bit - 1)
    if rounded:
        offset += 1 << (TORUS_BITS - l * Bg_bit - 1)
    return offset & TORUS_MASK


def gadget_decompose(x, Bg_bit: int, l: int, rounded: bool = True):
    """Signed gadget decomposition of torus array ``x`` ([..., N]).

    Returns int32 digits of shape [..., l, N] with values in
    [-Bg/2, Bg/2) such that  x ≈ sum_i digits[i] * 2^(TB-(i+1)*Bg_bit)
    (`polynomial.c:55-89`).  Digit axis is inserted before the last axis.
    """
    x = _ut(x)
    offset = TORUS_DTYPE(gadget_offset(Bg_bit, l, rounded))
    half_Bg = 1 << (Bg_bit - 1)
    mask = TORUS_DTYPE((1 << Bg_bit) - 1)
    shifts = jnp.array(
        [TORUS_BITS - (i + 1) * Bg_bit for i in range(l)], dtype=TORUS_DTYPE
    )
    # [..., l, N]
    shifted = (x + offset)[..., None, :] >> shifts[:, None]
    digits = (shifted & mask).astype(jnp.int64) - half_Bg
    return digits.astype(jnp.int32)


def gadget_recompose(digits, Bg_bit: int):
    """Inverse-ish of decompose: sum_i d_i * 2^(TB-(i+1)Bg_bit) mod 2^TB.

    Test helper (digits [..., l, N] signed)."""
    l = digits.shape[-2]
    weights = jnp.array(
        [1 << (TORUS_BITS - (i + 1) * Bg_bit) for i in range(l)],
        dtype=TORUS_DTYPE,
    )
    d = digits.astype(jnp.int64).astype(TORUS_DTYPE)
    return jnp.sum(d * weights[:, None], axis=-2, dtype=TORUS_DTYPE)
