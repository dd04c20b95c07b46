"""Regression test for the round-3 driver failure: the TORUS32 sub-bench
must always see /root/repo on PYTHONPATH even when the parent process was
launched with a PYTHONPATH that lacks it (BENCH_r03 lost its torus32_*
fields to exactly this)."""

import importlib.util
import os
import sys


def _load_bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_subbench_env_prepends_repo_root(monkeypatch):
    bench = _load_bench()
    repo_root = os.path.dirname(os.path.abspath(bench.__file__))

    # Hostile driver PYTHONPATH without the repo root
    monkeypatch.setenv("PYTHONPATH", "/some/driver/path")
    env = bench._subbench_env()
    parts = env["PYTHONPATH"].split(":")
    assert parts[0] == repo_root
    assert "/some/driver/path" in parts
    assert env["MOSFHET_TORUS_BITS"] == "32"

    # No PYTHONPATH at all
    monkeypatch.delenv("PYTHONPATH", raising=False)
    env = bench._subbench_env()
    assert env["PYTHONPATH"].split(":")[0] == repo_root
