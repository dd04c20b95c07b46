"""Measure the usable HBM ceiling of the attached chip: allocate 1 GiB
u32 arrays until RESOURCE_EXHAUSTED, then retry with 256 MiB granules.
Prints one JSON line {"metric": "hbm_usable_gib", "value": ...}."""

import json
import sys

import jax
import jax.numpy as jnp


def main():
    held = []
    gib = 0.0
    for size_mib in (1024,) * 20:
        try:
            held.append(jax.block_until_ready(
                jnp.zeros((size_mib * 256 * 1024,), jnp.uint32)))
            gib += size_mib / 1024
            print(f"# held {gib:.2f} GiB", file=sys.stderr, flush=True)
        except Exception:
            break
    for size_mib in (256,) * 4:
        try:
            held.append(jax.block_until_ready(
                jnp.zeros((size_mib * 256 * 1024,), jnp.uint32)))
            gib += size_mib / 1024
        except Exception:
            break
    print(json.dumps({"metric": "hbm_usable_gib", "value": round(gib, 2),
                      "unit": "GiB"}), flush=True)


if __name__ == "__main__":
    main()
