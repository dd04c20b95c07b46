"""Quickstart: encrypt -> programmable bootstrap -> decrypt.

The runnable on-ramp matching the reference's minimal skeleton
(`applications/template/main.c`) plus its gate-bootstrap usage pattern
(`test/tests.c:1578-1612`): encrypt a batch of 2-bit messages, evaluate a
lookup table homomorphically with one functional bootstrap each, decrypt,
and check the results.

Run on CPU (slow, small batch) or TPU:

    PYTHONPATH=/root/repo python examples/quickstart.py
"""

import jax
import jax.numpy as jnp

from mosfhet_tpu import params, tlwe, trlwe, trgsw, bootstrap, torus

p = params.TFHEPP_L2          # n=632, N=2048, k=1, l=4, Bg=2^9
batch = 8
torus_base = 4                # 2-bit messages

# --- key generation -------------------------------------------------------
k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 4)
key_in = tlwe.new_binary_key(k0, p.n, p.lwe_sigma)          # LWE key
key_rlwe = trlwe.new_binary_key(k1, p.N, p.k, p.rlwe_sigma)  # ring key
key_out = trlwe.extract_tlwe_key(key_rlwe)                   # output LWE key
gk = trgsw.new_key(key_rlwe, p.l, p.Bg_bit)
bk = bootstrap.new_key(k2, gk, key_in, unfolding=1)          # bootstrap key

# --- the function to evaluate: f(m) = (3 - m) mod 4, as a LUT -------------
lut_values = torus.double2torus(jnp.array([3.0, 2.0, 1.0, 0.0]) / 8.0)
test_vector = trlwe.torus_packing(lut_values, p.k, p.N)

# --- encrypt a batch of messages ------------------------------------------
messages = jnp.arange(batch) % torus_base
cleartext = torus.double2torus(messages / (2.0 * torus_base))
cts = tlwe.encrypt(cleartext, key_in, k3)

# --- bootstrap: one programmable bootstrap per ciphertext (batched) -------
out = jax.jit(
    lambda tv, cs, bk: bootstrap.functional_bootstrap(tv, cs, bk, torus_base)
)(test_vector, cts, bk)

# --- decrypt and verify ----------------------------------------------------
phase = jnp.asarray(tlwe.phase(out, key_out), jnp.uint64)
decoded = jnp.round(torus.torus2double(phase) * 8.0).astype(jnp.int32) % 8
expected = (3 - messages) % torus_base
print("messages :", list(map(int, messages)))
print("f(m)     :", list(map(int, decoded)))
print("expected :", list(map(int, expected)))
assert (decoded == expected).all(), "bootstrap output mismatch"
print("OK — batched programmable bootstrap decrypted correctly.")
