"""Pallas TPU kernels for the hot compute paths.

`pbs_kernel` — the fused CMUX external-product kernel used by
`bootstrap.blind_rotate` on TPU devices.  Import lazily (Pallas pulls in
Mosaic lowering machinery); the jnp paths never need this package.
"""
