"""Measure the usable HBM ceiling of the attached chip: allocate 1 GiB
u32 arrays until RESOURCE_EXHAUSTED, then retry with 256 MiB granules.
Prints one JSON line {"metric": "hbm_usable_gib", "value": ...}."""

import json
import sys

import jax
import jax.numpy as jnp


def main():
    def alloc(size_mib):
        # nonzero fill: a zeros buffer may be materialized lazily
        n = size_mib * 256 * 1024
        return jax.block_until_ready(
            jax.jit(lambda: jnp.arange(n, dtype=jnp.uint32))())

    held = []
    gib = 0.0
    for size_mib in (1024,) * 24:
        try:
            held.append(alloc(size_mib))
            gib += size_mib / 1024
            print(f"# held {gib:.2f} GiB", file=sys.stderr, flush=True)
        except Exception:
            break
    for size_mib in (256,) * 4:
        try:
            held.append(alloc(size_mib))
            gib += size_mib / 1024
        except Exception:
            break
    print(json.dumps({"metric": "hbm_usable_gib", "value": round(gib, 2),
                      "unit": "GiB"}), flush=True)


if __name__ == "__main__":
    main()
