"""Adjacency probe for the SET_3 circuit-bootstrap capacity boundary:
can the chip hold two 4.4 GiB buffers at once at all, and does a
keygen-shaped program run next to one?  Prints one JSON row per step."""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def step(tag, fn):
    try:
        v = jax.block_until_ready(fn())
        print(json.dumps({"step": tag, "ok": True}), flush=True)
        return v
    except Exception as e:
        print(json.dumps({"step": tag, "ok": False,
                          "err": str(e)[-160:]}), flush=True)
        return None


def big(n_gib):
    n = int(n_gib * 2**30 // 4)
    return jax.jit(lambda: jnp.arange(n, dtype=jnp.uint32))()


def main():
    a = step("alloc_4p5_a", lambda: big(4.5))
    b = step("alloc_4p5_b", lambda: big(4.5))
    c = step("alloc_4p5_c", lambda: big(4.5))
    del c
    # keygen-shaped program next to the two held buffers
    from mosfhet_tpu import params, trlwe, tlwe, keyswitch as ks
    p = params.get_params("SET_3")
    kk = jax.random.split(jax.random.PRNGKey(1), 3)
    key_trlwe = trlwe.new_binary_key(kk[0], p.N, p.k, p.rlwe_sigma)
    key_out = trlwe.extract_tlwe_key(key_trlwe)
    step("priv_sk_next_to_9GiB", lambda: jax.jit(
        lambda r, ok, ik: ks.new_priv_sk_ks_key_seeded(
            r, ok, ik, p.t, p.base_bit))(kk[1], key_trlwe, key_out))


if __name__ == "__main__":
    main()
