"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested on XLA's host platform (the driver separately
dry-runs the multichip path); the real TPU chip is only used by bench.py.

The ambient environment may register a real-TPU PJRT plugin at interpreter
start (sitecustomize) and pin JAX_PLATFORMS to it, which would make every
unit test a remote TPU compile — so we override via jax.config and reset the
backend cache.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    xla_bridge._clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
