"""Checkpoint / serialization.

Two formats:

1. **Native versioned format** (`save` / `load`): a zip (numpy .npz) holding
   a JSON manifest (type tag, version, static fields) + raw arrays.  The
   reference uses raw little-endian structs with no magic/version
   (`tlwe.c:43-58`, `trlwe.c:24-85`, `bootstrap.c:63-104`, ...); we add a
   magic + version so formats can evolve.

2. **MOSFHET importer** (`import_mosfhet_*`): readers for the reference's
   raw binary layouts of *time-domain* objects (keys, samples, KS keys), to
   enable cross-implementation test vectors.
"""

from __future__ import annotations

import dataclasses
import io as _io
import json
import struct
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = "mosfhet_tpu"
# v2: BootstrapKey.su became u32 limb planes [nl, n/u, 2^u, (k+1)l, k+1, N]
# (was u64 [n/u, 2^u, (k+1)l, k+1, N]); v1 files are migrated on load.
VERSION = 2

# Registry of serializable flax.struct dataclasses, filled lazily to avoid
# import cycles.
def _registry():
    from . import tlwe, trlwe, trgsw, keyswitch, bootstrap, seeded
    from . import bootstrap_ga, params
    from .apps import ufhe
    types = [
        # application keysets (`applications/multi-ciphertext-arith/src/io.c`
        # ships ufhe keyset IO in the reference)
        params.TFHEParams,
        ufhe.PrivKeyset, ufhe.PublicKeyset, ufhe.Context, ufhe.Integer,
        tlwe.TLWE, tlwe.TLWEKey, tlwe.TLWEKSKey, tlwe.TLWEKSKeyM,
        tlwe.TLWEKSKeyPrepared,
        trlwe.TRLWE, trlwe.TRLWEKey, trlwe.TRLWEDFT,
        trgsw.TRGSW, trgsw.TRGSWDFT, trgsw.TRGSWKey, trgsw.TRGSWReg,
        keyswitch.TRLWEKSKey, keyswitch.GenericKSKey,
        keyswitch.LUTPackingKSKey, keyswitch.FullPackingKSKey,
        keyswitch.SeededGenericKSKey, keyswitch.SeededLUTPackingKSKey,
        keyswitch.SeededTRLWEKSKey,
        bootstrap.BootstrapKey, bootstrap_ga.GABootstrapKey,
        seeded.SeededTRLWE, seeded.MosfhetSeededTRLWE,
    ]
    return {t.__name__: t for t in types}


def _encode(obj, prefix, arrays, manifest):
    """Recursively encode dataclass/list/tuple/dict/array/static values."""
    if obj is None:
        return {"kind": "none"}
    if isinstance(obj, (bool, int, float, str)):
        return {"kind": "static", "value": obj}
    if isinstance(obj, tuple) and all(isinstance(x, (int, float, str)) for x in obj):
        return {"kind": "static_tuple", "value": list(obj)}
    if isinstance(obj, (jnp.ndarray, np.ndarray)) or hasattr(obj, "dtype"):
        name = f"a{len(arrays)}"
        arrays[name] = np.asarray(obj)
        return {"kind": "array", "name": name}
    if isinstance(obj, (list, tuple)):
        return {"kind": "list", "tuple": isinstance(obj, tuple),
                "items": [_encode(x, prefix, arrays, manifest) for x in obj]}
    if isinstance(obj, dict):
        return {"kind": "dict",
                "items": {str(k): _encode(v, prefix, arrays, manifest)
                          for k, v in obj.items()},
                "int_keys": all(isinstance(k, int) for k in obj)}
    if dataclasses.is_dataclass(obj):
        fields = {}
        for f in dataclasses.fields(obj):
            fields[f.name] = _encode(getattr(obj, f.name), prefix, arrays,
                                     manifest)
        return {"kind": "dataclass", "type": type(obj).__name__,
                "fields": fields}
    raise TypeError(f"cannot serialize {type(obj)}")


def _decode(spec, arrays, reg):
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "static":
        return spec["value"]
    if kind == "static_tuple":
        return tuple(spec["value"])
    if kind == "array":
        return jnp.asarray(arrays[spec["name"]])
    if kind == "list":
        items = [_decode(x, arrays, reg) for x in spec["items"]]
        return tuple(items) if spec.get("tuple") else items
    if kind == "dict":
        d = {(int(k) if spec.get("int_keys") else k): _decode(v, arrays, reg)
             for k, v in spec["items"].items()}
        return d
    if kind == "dataclass":
        cls = reg[spec["type"]]
        kwargs = {k: _decode(v, arrays, reg) for k, v in spec["fields"].items()}
        return cls(**kwargs)
    raise TypeError(f"bad spec kind {kind}")


def save(path, obj):
    """Save any (possibly nested) mosfhet_tpu object to `path`."""
    arrays = {}
    manifest = {"magic": MAGIC, "version": VERSION,
                "root": _encode(obj, "", arrays, None)}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("manifest.json", json.dumps(manifest))
        for name, arr in arrays.items():
            buf = _io.BytesIO()
            np.save(buf, arr, allow_pickle=False)
            z.writestr(name + ".npy", buf.getvalue())


def _migrate_v1(obj):
    """v1 -> v2: re-split u64 BootstrapKey.su into limb planes (recursive
    over containers/dataclasses)."""
    from .bootstrap import BootstrapKey, _split_su_planes
    # v1 su is [n/u, 2^u, (k+1)l, k+1, N] (5-D, torus dtype); v2 adds the
    # leading limb-plane axis (6-D u32) — ndim disambiguates both widths
    if isinstance(obj, BootstrapKey) and obj.su is not None \
            and obj.su.ndim == 5:
        return BootstrapKey(v=obj.v, vs=obj.vs, su=_split_su_planes(obj.su),
                            n=obj.n, k=obj.k, N=obj.N, l=obj.l,
                            Bg_bit=obj.Bg_bit, unfolding=obj.unfolding,
                            primes=obj.primes)
    if isinstance(obj, (list, tuple)):
        return type(obj)(_migrate_v1(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _migrate_v1(v) for k, v in obj.items()}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        kw = {f.name: _migrate_v1(getattr(obj, f.name))
              for f in dataclasses.fields(obj)}
        return type(obj)(**kw)
    return obj


def load(path):
    with zipfile.ZipFile(path, "r") as z:
        manifest = json.loads(z.read("manifest.json"))
        assert manifest["magic"] == MAGIC, "not a mosfhet_tpu file"
        assert manifest["version"] <= VERSION, "file from a newer version"
        arrays = {}
        for name in z.namelist():
            if name.endswith(".npy"):
                arrays[name[:-4]] = np.load(_io.BytesIO(z.read(name)),
                                            allow_pickle=False)
    obj = _decode(manifest["root"], arrays, _registry())
    if manifest["version"] < 2:
        obj = _migrate_v1(obj)
    return obj


# =========================================================================
# MOSFHET raw-binary importers/exporters (reference layouts)
# =========================================================================

def _read(f, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def _read_u64(f, count):
    return np.frombuffer(f.read(8 * count), dtype="<u8", count=count)


def _write_u64(f, arr):
    f.write(np.ascontiguousarray(np.asarray(arr, dtype="<u8")).tobytes())


def export_mosfhet_tlwe_key(f, key):
    """`tlwe_save_key` layout (`tlwe.c:85-89`)."""
    f.write(struct.pack("<i", key.n))
    f.write(struct.pack("<d", float(key.sigma)))
    _write_u64(f, np.asarray(key.s).astype(np.int64).astype(np.uint64))


def export_mosfhet_tlwe(f, c):
    """`tlwe_save_sample` (`tlwe.c:43-46`).  Single (unbatched) sample."""
    _write_u64(f, c.a)
    _write_u64(f, np.asarray(c.b, np.uint64).reshape(1))


def export_mosfhet_trlwe_key(f, key):
    """`trlwe_save_key` (`trlwe.c:230-237`)."""
    f.write(struct.pack("<ii", key.k, key.N))
    f.write(struct.pack("<d", float(key.sigma)))
    _write_u64(f, np.asarray(key.s).astype(np.int64).astype(np.uint64))


def export_mosfhet_trlwe(f, c):
    """`trlwe_save_sample` (`trlwe.c:24-29`)."""
    _write_u64(f, c.a)
    _write_u64(f, c.b)


def export_mosfhet_trgsw(f, g):
    """`trgsw_save_sample` (`trgsw.c:60-64`): (k+1)*l TRLWE rows."""
    _write_u64(f, g.rows)


def export_mosfhet_tlwe_ks_key(f, ksk):
    """`tlwe_save_KS_key` (`tlwe.c:274-287`)."""
    n_in, t, base_m1, n_out = ksk.a.shape
    f.write(struct.pack("<iiii", n_in, t,
                        (base_m1 + 1).bit_length() - 1, n_out))
    ab = np.concatenate(
        [np.asarray(ksk.a, np.uint64),
         np.asarray(ksk.b, np.uint64)[..., None]], axis=-1)
    _write_u64(f, ab)


def import_mosfhet_tlwe_key(f):
    """`tlwe_save_key` layout: int n, double sigma, u64 s[n] (`tlwe.c:85-89`)."""
    from .tlwe import TLWEKey
    (n,) = _read(f, "<i")
    (sigma,) = _read(f, "<d")
    s = _read_u64(f, n).astype(np.int64)
    return TLWEKey(s=jnp.asarray(s), sigma=float(sigma))


def import_mosfhet_tlwe(f, n: int):
    """`tlwe_save_sample`: u64 a[n], u64 b (`tlwe.c:43-46`)."""
    from .tlwe import TLWE
    a = _read_u64(f, n)
    b = _read_u64(f, 1)[0]
    return TLWE(a=jnp.asarray(a), b=jnp.asarray(b))


def import_mosfhet_trlwe_key(f):
    """`trlwe_save_key`: int k, int N, double sigma, u64 s[k][N]
    (`trlwe.c:230-237`)."""
    from .trlwe import TRLWEKey
    k, N = _read(f, "<ii")
    (sigma,) = _read(f, "<d")
    s = _read_u64(f, k * N).astype(np.int64).reshape(k, N)
    bound = int(max(1, np.max(np.abs(s))))
    return TRLWEKey(s=jnp.asarray(s), sigma=float(sigma), s_bound=bound)


def import_mosfhet_trlwe(f, k: int, N: int):
    """`trlwe_save_sample`: u64 a[k][N], u64 b[N] (`trlwe.c:24-29`)."""
    from .trlwe import TRLWE
    a = _read_u64(f, k * N).reshape(k, N)
    b = _read_u64(f, N)
    return TRLWE(a=jnp.asarray(a), b=jnp.asarray(b))


def import_mosfhet_trgsw(f, l: int, Bg_bit: int, k: int, N: int):
    """`trgsw_save_sample`: (k+1)*l TRLWE samples (`trgsw.c:60-64`)."""
    from .trgsw import TRGSW
    rows = []
    for _ in range((k + 1) * l):
        c = import_mosfhet_trlwe(f, k, N)
        rows.append(jnp.concatenate([c.a, c.b[None]], axis=0))
    return TRGSW(rows=jnp.stack(rows), l=l, Bg_bit=Bg_bit)


def import_mosfhet_bootstrap_key(f):
    """`save_bootstrap_key` (`bootstrap.c:62-79`): ints n, l, k, N, Bg_bit,
    unfolding, then the TRGSW array.  Only unfolding >= 2 keys are stored in
    the (exactly importable) time domain; unfold-1 keys are saved as the
    reference's f64 FFT representation and cannot be imported losslessly."""
    from . import ntt as _ntt
    from .bootstrap import BootstrapKey
    n, l, k, N, Bg_bit, unfolding = _read(f, "<iiiiii")
    assert unfolding >= 2, "unfold-1 keys are stored in the f64 DFT domain"
    key_exp = 1 << unfolding
    count = n * key_exp // unfolding
    rows = [import_mosfhet_trgsw(f, l, Bg_bit, k, N).rows
            for _ in range(count)]
    from .bootstrap import _split_su_planes
    su = _split_su_planes(
        jnp.stack(rows).reshape(n // unfolding, key_exp, (k + 1) * l,
                                k + 1, N))
    # 1x conv bound: unfolded keys never take the rot-NTT step (the
    # unfolded combine rotates KEY spectra before the convolution, which
    # keeps centered coefficients <= 2^63, unlike the rot-NTT step's
    # post-convolution (X^a - 1) factor), so the 2x
    # `external_product_bound` would only risk an extra prime for
    # imported keys outside the registered sets.
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), (k + 1) * l)
    primes = _ntt.primes_for_bound(bound, N)
    return BootstrapKey(v=None, vs=None, su=su, n=n, k=k, N=N, l=l,
                        Bg_bit=Bg_bit, unfolding=unfolding, primes=primes)


def import_mosfhet_compressed_trlwe(f, k: int, N: int, prng="xoroshiro"):
    """`trlwe_save_compressed_sample`: 16 seed bytes then u64 b[N]
    (`trlwe_compressed.c:66-69`).  Expand with `seeded.expand_mosfhet`."""
    from .seeded import MosfhetSeededTRLWE
    seed = np.frombuffer(f.read(16), dtype=np.uint8).copy()
    b = _read_u64(f, N)
    return MosfhetSeededTRLWE(seed=jnp.asarray(seed), b=jnp.asarray(b.copy()),
                              k=k, prng=prng)


def import_mosfhet_tlwe_ks_key(f):
    """`tlwe_save_KS_key`: ints n, t, base_bit, n_out then n*t*(base-1)
    TLWE samples (`tlwe.c:274-287`)."""
    from .tlwe import TLWEKSKey
    n, t, base_bit, n_out = _read(f, "<iiii")
    base = 1 << base_bit
    raw = _read_u64(f, n * t * (base - 1) * (n_out + 1)).reshape(
        n, t, base - 1, n_out + 1)
    return TLWEKSKey(a=jnp.asarray(raw[..., :n_out]),
                     b=jnp.asarray(raw[..., n_out]),
                     t=t, base_bit=base_bit)


# -------------------------------------------------------------------------
# FFNT f64-DFT wire format (the reference's portable-build DFT layout)
#
# The reference saves TRLWE-KS keys and unfold-1 bootstrap keys with their
# polynomials in the FFT backend's f64 DFT domain (`keyswitch.c:122-159`,
# `bootstrap.c:63-79`).  For the FFNT backend (`src/fft/ffnt/ffnt.c`), a
# DFT_Polynomial of N doubles holds N/2 complex values re[0:N/2], im[N/2:N];
# slot j evaluates the polynomial at psi^(e_j), psi = exp(i*pi/N), where the
# odd exponents e_j follow the Gentleman-Sande no-bit-reversal output order.
# The closed form below was fitted against reference-generated probe
# transforms and verified exactly at N=256 and N=2048
# (tests/vectors/v2_dft_probe*.bin).
#
# Conversion back to integer coefficients is exact for key material (small
# values) and exact-to-f64-representation for torus-sized values — the same
# precision the reference itself retains for DFT-stored keys.
# -------------------------------------------------------------------------

def _ffnt_slot_exponents(N: int) -> np.ndarray:
    """e_j (odd, mod 2N) for slots j < N/2 of the FFNT DFT layout."""
    half = N // 2
    bits = half.bit_length() - 1

    def br(x):
        r = 0
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        return r

    es = np.zeros(half, dtype=np.int64)
    for j in range(half):
        if j == 0:
            jp = 0
        else:
            m = j.bit_length() - 1          # dyadic block [2^m, 2^(m+1))
            jp = (1 << m) + ((1 << (m + 1)) - 1 - j)
        es[j] = 4 * br(jp) + 1
    return es


def _spqlios_slot_exponents(N: int) -> np.ndarray:
    """e_j (odd, mod 2N) for slots j < N/2 of the SPQLIOS DFT layout
    (the reference's *default* FFT backend,
    `fft_processor_spqlios.c:81-97`, tables `spqlios-fft-impl.c:70-113`).

    Fitted from reference-generated delta probes at N=256 and N=2048
    (tests/vectors/v3_sp_probe*.bin): like FFNT the file holds
    re[0:N/2], im[N/2:N] of evaluations at psi^e_j, but the slot order is
    the plain bit-reversal e_j = 4*bitrev(j) + 1 — without FFNT's
    dyadic-block reordering."""
    half = N // 2
    bits = half.bit_length() - 1

    def br(x):
        r = 0
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        return r

    return np.array([4 * br(j) + 1 for j in range(half)], dtype=np.int64)


_DFT_LAYOUTS = {"ffnt": _ffnt_slot_exponents,
                "spqlios": _spqlios_slot_exponents}
_FFNT_CACHE = {}


def _ffnt_matrix(N: int, layout: str = "ffnt") -> np.ndarray:
    """[N/2, N] complex: M[j, k] = psi^(e_j * k)."""
    if (N, layout) not in _FFNT_CACHE:
        es = _DFT_LAYOUTS[layout](N)
        ks = np.arange(N)
        _FFNT_CACHE[N, layout] = np.exp(1j * np.pi * np.outer(es, ks) / N)
    return _FFNT_CACHE[N, layout]


def torus_to_ffnt_dft(p, layout: str = "ffnt") -> np.ndarray:
    """u64 torus coefficients [..., N] -> f64 DFT doubles [..., N]
    (`execute_reverse_torus64`: signed reinterpretation then the twisted
    forward transform; `ffnt.c:820-831` / `fft_processor_spqlios.c:81-97`
    depending on `layout`)."""
    p = np.asarray(p, dtype=np.uint64)
    N = p.shape[-1]
    a = p.view(np.int64).astype(np.float64)
    z = a @ _ffnt_matrix(N, layout).T         # [..., N/2] complex
    return np.concatenate([z.real, z.imag], axis=-1)


def ffnt_dft_to_torus(d, layout: str = "ffnt") -> np.ndarray:
    """f64 DFT doubles [..., N] -> u64 torus coefficients [..., N].

    Inverse evaluation (a_k = (2/N) sum_j Re(z_j psi^(-e_j k))), rounded to
    the nearest integer mod 2^64 — recovers the reference's effective
    coefficients to within its own f64 precision."""
    d = np.asarray(d, dtype=np.float64)
    N = d.shape[-1]
    z = d[..., :N // 2] + 1j * d[..., N // 2:]
    a = (2.0 / N) * (z @ np.conj(_ffnt_matrix(N, layout)))
    # centered values in (-2^63, 2^63): two's-complement reinterpret
    return np.round(a.real).astype(np.int64).astype(np.uint64)


def import_mosfhet_trlwe_dft(f, k: int, N: int, layout: str = "ffnt"):
    """`trlwe_save_DFT_sample` (portable/FFNT build): k+1 DFT polynomials
    of N doubles -> time-domain TRLWE."""
    from .trlwe import TRLWE
    d = np.frombuffer(f.read(8 * (k + 1) * N), dtype="<f8").reshape(k + 1, N)
    coeffs = ffnt_dft_to_torus(d, layout)
    return TRLWE(a=jnp.asarray(coeffs[:k]), b=jnp.asarray(coeffs[k]))


def export_mosfhet_trlwe_dft(f, c, layout: str = "ffnt"):
    """Write a TRLWE in the reference's FFNT DFT-sample layout."""
    st = np.concatenate([np.asarray(c.a, np.uint64),
                         np.asarray(c.b, np.uint64)[None]], axis=0)
    f.write(np.ascontiguousarray(
        torus_to_ffnt_dft(st, layout).astype("<f8")).tobytes())


def import_mosfhet_trlwe_ks_key(f, layout: str = "ffnt"):
    """`trlwe_save_KS_key` (`keyswitch.c:122-141`): ints base_bit, t, k_in,
    k, N then k_in*t TRLWE DFT samples.

    (The reference's save loop iterates the *output* k while its load
    iterates k_in — identical for every real use, where k_in == k.)"""
    from . import keyswitch as _ks
    base_bit, t, k_in, k, N = _read(f, "<iiiii")
    from . import ntt as _ntt2
    plan = _ks._ks_plan(N, base_bit, t, k_in * t)
    rows = []
    for _ in range(k_in):
        per_t = [import_mosfhet_trlwe_dft(f, k, N, layout) for _ in range(t)]
        rows.append(np.stack([
            np.concatenate([np.asarray(c.a, np.uint64),
                            np.asarray(c.b, np.uint64)[None]], axis=0)
            for c in per_t]))
    st = jnp.asarray(np.stack(rows))              # [k_in, t, k+1, N]
    v = _ntt2.to_ntt_u64(st, plan)
    vs = _ntt2.make_shoup(v, plan.p[:, None])
    return _ks.TRLWEKSKey(v=v, vs=vs, t=t, base_bit=base_bit,
                          primes=plan.primes)


def export_mosfhet_trlwe_ks_key(f, ksk, layout: str = "ffnt"):
    """Write a TRLWEKSKey in the reference's format (FFNT DFT samples)."""
    from . import ntt as _ntt2
    plan = ksk.plan()
    st = np.asarray(_ntt2.from_ntt_u64(ksk.v, plan))   # [k_in, t, k+1, N]
    k_in, t = st.shape[0], st.shape[1]
    k, N = st.shape[2] - 1, st.shape[3]
    f.write(struct.pack("<iiiii", ksk.base_bit, t, k_in, k, N))
    for i in range(k_in):
        for j in range(t):
            f.write(np.ascontiguousarray(
                torus_to_ffnt_dft(st[i, j], layout).astype("<f8")).tobytes())


def _read_compressed_trlwe_batch(f, count: int, k: int, N: int, prng: str,
                                 aes_key: bytes | None = None):
    """Read `count` TRLWE samples and expand their masks, returning
    stacked [count, k+1, N] u64.  prng "shake"/"xoroshiro"/"vaes" read the
    compressed form (16-byte seed + b[N]); "none" reads plain samples
    (the reference's A_PRNG=none build stores full a + b)."""
    from . import seeded as _seeded
    from .seeded import MosfhetSeededTRLWE
    out = np.zeros((count, k + 1, N), dtype=np.uint64)
    if prng == "none":
        for i in range(count):
            out[i] = _read_u64(f, (k + 1) * N).reshape(k + 1, N)
        return out
    for i in range(count):
        if prng == "vaes":
            # the vaes build writes a 128-byte seed field (ID_SIZE used as
            # an element count — see import_mosfhet_compressed_trlwe_vaes)
            seed = np.frombuffer(f.read(128)[:16], dtype=np.uint8).copy()
        else:
            seed = np.frombuffer(f.read(16), dtype=np.uint8).copy()
        b = _read_u64(f, N).copy()
        if prng == "vaes":
            a = _expand_aes_mask(seed.tobytes(), aes_key, k, N)
        else:
            c = MosfhetSeededTRLWE(seed=jnp.asarray(seed),
                                   b=jnp.asarray(b), k=k, prng=prng)
            a = np.asarray(_seeded.expand_mosfhet(c).a, np.uint64)
        out[i, :k] = a
        out[i, k] = b
    return out


def export_mosfhet_packing_ks_key(f, key):
    """Write a LUT-packing KS key in `trlwe_save_packing_KS_key` layout
    with PLAIN samples — readable by the reference's A_PRNG=none build
    (compressed-sample export would need reference-PRNG-seeded keys; our
    native keys are threefry-seeded)."""
    n, tb, t, base_m1, C, N = key.table.shape
    base_bit = key.base_bit
    f.write(struct.pack("<iiiiii", base_bit, t, tb, n, C - 1, N))
    _write_u64(f, np.asarray(key.table, np.uint64))


def export_mosfhet_generic_ks_key(f, key):
    """`trlwe_save_generic_ks_key` layout with plain samples (A_PRNG=none
    build)."""
    nb, t, base_m1, C, N = key.table.shape
    n = nb - (1 if key.include_b else 0)
    f.write(struct.pack("<iiiiii", key.base_bit, t, n, C - 1, N,
                        1 if key.include_b else 0))
    _write_u64(f, np.asarray(key.table, np.uint64))


def import_mosfhet_packing_ks_key(f, prng: str = "shake",
                                  aes_key: bytes | None = None):
    """`trlwe_save_packing_KS_key` (`keyswitch.c:272-289`): ints base_bit,
    t, torus_base, n, k, N then n*torus_base*t*(base-1) compressed TRLWE
    samples (the reference's USE_COMPRESSED_TRLWE builds)."""
    from .keyswitch import LUTPackingKSKey
    base_bit, t, torus_base, n, k, N = _read(f, "<iiiiii")
    base = 1 << base_bit
    count = n * torus_base * t * (base - 1)
    tab = _read_compressed_trlwe_batch(f, count, k, N, prng, aes_key)
    tab = tab.reshape(n, torus_base, t, base - 1, k + 1, N)
    return LUTPackingKSKey(table=jnp.asarray(tab), t=t, base_bit=base_bit,
                           torus_base=torus_base)


def import_mosfhet_generic_ks_key(f, prng: str = "shake",
                                  aes_key: bytes | None = None):
    """`trlwe_save_generic_ks_key` (`keyswitch.c:409-424`): ints base_bit,
    t, n, k, N, include_b then (n+include_b)*t*(base-1) compressed TRLWE
    samples."""
    from .keyswitch import GenericKSKey
    base_bit, t, n, k, N, include_b = _read(f, "<iiiiii")
    base = 1 << base_bit
    count = (n + include_b) * t * (base - 1)
    tab = _read_compressed_trlwe_batch(f, count, k, N, prng, aes_key)
    tab = tab.reshape(n + include_b, t, base - 1, k + 1, N)
    return GenericKSKey(table=jnp.asarray(tab), t=t, base_bit=base_bit,
                        include_b=bool(include_b))


def _expand_aes_mask(seed: bytes, aes_key: bytes, k: int, N: int):
    """AES-CTR mask expansion (`trlwe_compressed_vaes.c:62-87` +
    `aes_rng.c:128-149`): block j of component i is
    AES128_Enc(process_key, seed_lo || LE64(seed_hi + i*N/2 + j)).

    The reference's A_PRNG=vaes build derives the keystream from a *global
    process key* (seed only seeds the counter), so cross-process import
    additionally needs that key — pass it as `aes_key` (an application
    fixes it via `setup_aes_prgn_key`)."""
    from . import native as _native
    assert aes_key is not None and len(aes_key) == 16, \
        "vaes-mode samples need the 16-byte process AES key"
    masks = np.zeros((k, N), dtype=np.uint64)
    for i in range(k):
        iv = bytearray(seed)
        hi = int.from_bytes(iv[8:16], "little")
        hi = (hi + i * (N // 2)) & ((1 << 64) - 1)
        iv[8:16] = hi.to_bytes(8, "little")
        ks = _native.aes128_ctr_le(aes_key, bytes(iv), N // 2)
        masks[i] = np.frombuffer(ks, dtype="<u8", count=N)
    return masks


def import_mosfhet_compressed_trlwe_vaes(f, k: int, N: int, aes_key: bytes):
    """AES-CTR-mode compressed sample (`trlwe_compressed_vaes.c:44-59`):
    seed field + u64 b[N], expanded immediately to a full TRLWE.

    Quirk: the vaes build's save writes `ID_SIZE` *Torus elements* (128
    bytes) for the 16-byte seed (`fwrite(..., sizeof(Torus), ID_SIZE, ...)`,
    `trlwe_compressed_vaes.c:57-59`) — only the first 16 bytes are the
    seed; the rest is the writer's adjacent heap memory."""
    from .trlwe import TRLWE
    seed = f.read(128)[:16]
    b = _read_u64(f, N).copy()
    a = _expand_aes_mask(seed, aes_key, k, N)
    return TRLWE(a=jnp.asarray(a), b=jnp.asarray(b))


def export_mosfhet_bootstrap_key(f, bk, layout: str = "ffnt"):
    """`save_bootstrap_key` (`bootstrap.c:63-79`): ints n, l, k, N, Bg_bit,
    unfolding; unfold=1 keys as DFT TRGSWs (FFNT layout), unfold>=2 keys as
    time-domain TRGSWs."""
    from . import ntt as _ntt2
    f.write(struct.pack("<iiiiii", bk.n, bk.l, bk.k, bk.N, bk.Bg_bit,
                        bk.unfolding))
    if bk.unfolding == 1:
        plan = bk.plan()
        rows = np.asarray(_ntt2.garner_u64(
            _ntt2.inverse_ntt(jnp.asarray(bk.v), plan), plan),
            np.uint64)                         # [n, (k+1)l, k+1, N]
        for i in range(rows.shape[0]):
            f.write(np.ascontiguousarray(
                torus_to_ffnt_dft(rows[i], layout).astype("<f8")).tobytes())
        return
    _write_u64(f, np.asarray(bk.su_u64(), np.uint64))


def import_mosfhet_bootstrap_key_dft(f, layout: str = "ffnt"):
    """`load_new_bootstrap_key` for unfold=1 (DFT-format) keys: recover the
    time-domain TRGSW rows from the FFNT DFT samples and rebuild the
    NTT-form key."""
    from . import ntt as _ntt
    from .bootstrap import BootstrapKey
    n, l, k, N, Bg_bit, unfolding = _read(f, "<iiiiii")
    assert unfolding == 1
    R = (k + 1) * l
    rows = np.zeros((n, R, k + 1, N), dtype=np.uint64)
    for i in range(n):
        d = np.frombuffer(f.read(8 * R * (k + 1) * N),
                          dtype="<f8").reshape(R, k + 1, N)
        rows[i] = ffnt_dft_to_torus(d, layout)
    bound = _ntt.external_product_bound(N, Bg_bit, l, k)
    primes = _ntt.primes_for_bound(bound, N)
    plan = _ntt.get_plan(N, primes)
    v = _ntt.to_ntt_u64(jnp.asarray(rows), plan)
    vs = _ntt.make_shoup(v, plan.p[:, None])
    return BootstrapKey(v=v, vs=vs, su=None, n=n, k=k, N=N, l=l,
                        Bg_bit=Bg_bit, unfolding=1, primes=primes)
