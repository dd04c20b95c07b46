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
VERSION = 1

# Registry of serializable flax.struct dataclasses, filled lazily to avoid
# import cycles.
def _registry():
    from . import tlwe, trlwe, trgsw, keyswitch, bootstrap, seeded
    from . import bootstrap_ga
    types = [
        tlwe.TLWE, tlwe.TLWEKey, tlwe.TLWEKSKey, tlwe.TLWEKSKeyM,
        tlwe.TLWEKSKeyPrepared,
        trlwe.TRLWE, trlwe.TRLWEKey, trlwe.TRLWEDFT,
        trgsw.TRGSW, trgsw.TRGSWDFT, trgsw.TRGSWKey, trgsw.TRGSWReg,
        keyswitch.TRLWEKSKey, keyswitch.GenericKSKey,
        keyswitch.LUTPackingKSKey, keyswitch.FullPackingKSKey,
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
    return _decode(manifest["root"], arrays, _registry())


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
    su = jnp.stack(rows).reshape(n // unfolding, key_exp, (k + 1) * l,
                                 k + 1, N)
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), (k + 1) * l)
    primes = _ntt.primes_for_bound(bound)
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
