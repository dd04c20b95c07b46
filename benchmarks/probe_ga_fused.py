"""Compile-probe the GA stream-KS kernel: unfused vs fused permute.

Chipless remote AOT compile (no device execution) — safe to run while a
bench leg holds the chip.  One JSON row per probe.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mosfhet_tpu import ntt as _ntt                      # noqa: E402
from mosfhet_tpu.ops import pbs_kernel as pk             # noqa: E402

N, k, l, Bg_bit = 2048, 1, 4, 9
C = k + 1
J = C * l
B = pk.DEFAULT_BT
_rng = np.random.default_rng(11)


def _rand(shape, dtype=np.uint64, hi=None):
    hi = hi if hi is not None else np.iinfo(dtype).max
    return jnp.asarray(_rng.integers(0, hi, shape, dtype=np.int64
                                     if dtype == np.int32 else np.uint64)
                       .astype(dtype))


def probe(name, fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).trace(*args).lower().compile()
        print(json.dumps({"probe": name, "ok": True,
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
    except Exception as ex:
        msg = f"{type(ex).__name__}: {ex}"
        tail = [ln for ln in msg.splitlines() if ln.strip()]
        print(json.dumps({"probe": name, "ok": False,
                          "compile_s": round(time.time() - t0, 1),
                          "err": " | ".join(tail[:6])[:600]}), flush=True)


def main():
    bound = _ntt.conv_bound(N, 1 << (Bg_bit - 1), J)
    primes = _ntt.primes_for_bound(bound)
    for mode in ("default", "mxu"):
        kp = pk.get_kernel_plan(N, primes, l, Bg_bit, k,
                                mxu=(mode == "mxu"))
        Jk = (C - 1) * l
        Gk = 4
        perm = _rand((B, C, N))
        ak = _rand((Gk, Jk, C, kp.P, N), np.uint64,
                   hi=min(kp.primes)).astype(jnp.uint32)
        kidx = _rand((B,), np.int32, hi=Gk)
        ginv = (2 * _rand((B,), np.int32, hi=N) + 1).astype(jnp.int32)
        probe(f"ga_stream_unfused_{mode}",
              lambda p_, a_, i_, kp=kp:
              pk.auto_keyswitch_stream(p_, a_, i_, kp), perm, ak, kidx)
        probe(f"ga_stream_fused_{mode}",
              lambda p_, a_, i_, g_, kp=kp:
              pk.auto_keyswitch_stream(p_, a_, i_, kp, ginv=g_),
              perm, ak, kidx, ginv)


if __name__ == "__main__":
    main()
