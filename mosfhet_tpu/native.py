"""ctypes bindings for the native runtime (`native/libmosfhet_native.so`).

The native library provides host-side, reference-compatible PRNG expansion
for seeded (compressed) ciphertexts and key material — the workloads the
reference serves with native AVX2/VAES code (`src/trlwe_compressed*.c`,
`src/rnd/aes_rng.c`, `src/sha3/fips202.c`).  Pure-numpy fallbacks keep the
package importable without a toolchain; `expand_seed_*` pick whichever is
available.

Build: `make -C native` (done automatically on first use if `g++` exists).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmosfhet_native.so")

_lib = None
_lib_tried = False


_REQUIRED_SYMBOLS = ("mosfhet_xoroshiro_expand", "mosfhet_xoroshiro_next_n",
                     "mosfhet_shake128", "mosfhet_shake256",
                     "mosfhet_aes128_ctr", "mosfhet_aes128_ctr_le")


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True

    def _rebuild():
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-B", "-s"],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        if not _rebuild():
            return None
    # a stale .so (built before a symbol was added) must trigger a rebuild,
    # not an AttributeError that takes down the numpy-fallback paths
    try:
        probe = ctypes.CDLL(_LIB_PATH)
        missing = [s for s in _REQUIRED_SYMBOLS if not hasattr(probe, s)]
    except OSError:
        missing = list(_REQUIRED_SYMBOLS)
    if missing:
        if not (os.path.isdir(_NATIVE_DIR) and _rebuild()):
            return None
        probe = ctypes.CDLL(_LIB_PATH)
        if any(not hasattr(probe, s) for s in _REQUIRED_SYMBOLS):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mosfhet_xoroshiro_expand.restype = ctypes.c_int
    lib.mosfhet_xoroshiro_expand.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_size_t, ctypes.c_size_t]
    lib.mosfhet_xoroshiro_next_n.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_size_t]
    for name in ("mosfhet_shake128", "mosfhet_shake256"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
    for name in ("mosfhet_aes128_ctr", "mosfhet_aes128_ctr_le"):
        getattr(lib, name).argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# --- pure-numpy reference implementations (fallback + test oracle) ----------

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x, k):
    return (x << np.uint64(k)) | (x >> np.uint64(64 - k))


def _xoro_next(state):
    """Scalar xoroshiro128++ step on a length-2 u64 array (in place)."""
    with np.errstate(over="ignore"):
        s0, s1 = state[0], state[1]
        result = (_rotl(s0 + s1, 17) + s0) & _MASK
        s1 = s1 ^ s0
        state[0] = (_rotl(s0, 49) ^ s1 ^ (s1 << np.uint64(21))) & _MASK
        state[1] = _rotl(s1, 28)
    return result


def xoroshiro_expand_np(seed: bytes, n_polys: int, N: int) -> np.ndarray:
    """Reference-order 4-lane expansion, pure numpy (vectorized over lanes)."""
    assert len(seed) == 16 and N % 4 == 0
    st = np.frombuffer(seed, dtype="<u8").copy()
    s0 = np.zeros(4, np.uint64)
    s1 = np.zeros(4, np.uint64)
    for i in range(4):
        s0[i] = _xoro_next(st)
        s1[i] = _xoro_next(st)
    total = n_polys * N
    out = np.zeros(total, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(0, total, 4):
            out[j:j + 4] = (_rotl(s0 + s1, 17) + s0) & _MASK
            t1 = s0 ^ s1
            s0 = (_rotl(s0, 49) ^ t1 ^ (t1 << np.uint64(21))) & _MASK
            s1 = _rotl(t1, 28)
    return out.reshape(n_polys, N)


def shake128_expand_np(seed: bytes, nbytes: int) -> bytes:
    return hashlib.shake_128(seed).digest(nbytes)


def shake256_expand_np(seed: bytes, nbytes: int) -> bytes:
    return hashlib.shake_256(seed).digest(nbytes)


# --- public API --------------------------------------------------------------

def xoroshiro_expand(seed: bytes, n_polys: int, N: int) -> np.ndarray:
    """16-byte seed -> [n_polys, N] uint64, the reference's compressed-TRLWE
    mask expansion (`trlwe_compressed_sample`, `trlwe_compressed.c:72-99`)."""
    lib = _load()
    if lib is None:
        return xoroshiro_expand_np(seed, n_polys, N)
    out = np.zeros(n_polys * N, np.uint64)
    rc = lib.mosfhet_xoroshiro_expand(
        seed, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n_polys, N)
    assert rc == 0
    return out.reshape(n_polys, N)


def shake128_expand(seed: bytes, nbytes: int) -> bytes:
    lib = _load()
    if lib is None:
        return shake128_expand_np(seed, nbytes)
    out = np.zeros(nbytes, np.uint8)
    lib.mosfhet_shake128(seed, len(seed),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         nbytes)
    return out.tobytes()


def shake256_expand(seed: bytes, nbytes: int) -> bytes:
    lib = _load()
    if lib is None:
        return shake256_expand_np(seed, nbytes)
    out = np.zeros(nbytes, np.uint8)
    lib.mosfhet_shake256(seed, len(seed),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         nbytes)
    return out.tobytes()


def shake_mask_expand(seed: bytes, k: int, N: int) -> np.ndarray:
    """The reference's USE_SHAKE mask expansion: squeeze k*N torus words."""
    raw = shake128_expand(seed, 8 * k * N)
    return np.frombuffer(raw, dtype="<u8").reshape(k, N)


def aes128_ctr(key: bytes, iv: bytes, nblocks: int) -> bytes:
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "AES-CTR requires the native library (make -C native)")
    out = np.zeros(nblocks * 16, np.uint8)
    lib.mosfhet_aes128_ctr(key, iv,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           nblocks)
    return out.tobytes()


def aes128_ctr_le(key: bytes, iv: bytes, nblocks: int) -> bytes:
    """MOSFHET A_PRNG=vaes keystream: counter's high u64 incremented
    little-endian (`src/rnd/aes_rng.c:128-149`)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "AES-CTR requires the native library (make -C native)")
    out = np.zeros(nblocks * 16, np.uint8)
    lib.mosfhet_aes128_ctr_le(
        key, iv, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nblocks)
    return out.tobytes()
