"""TORUS32 (u32 torus) build — the reference's `-DTORUS32` flag.

The torus width is fixed at import time (like the reference's compile-time
flag), so the 32-bit suite runs in a subprocess with
MOSFHET_TORUS_BITS=32 set."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_torus32_suite():
    env = dict(os.environ)
    env["MOSFHET_TORUS_BITS"] = "32"
    env["JAX_PLATFORMS"] = "cpu"
    suite = os.path.join(os.path.dirname(__file__), "_torus32_suite.py")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", suite, "-q", "-p", "no:cacheprovider"],
        env=env, capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
