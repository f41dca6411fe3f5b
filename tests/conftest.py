"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

NOTE: under the axon TPU plugin the JAX_PLATFORMS *env var* is overridden at
import time; only `jax.config.update("jax_platforms", ...)` reliably selects
the CPU backend, so we do both (XLA_FLAGS is honored either way)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8").strip()
# No persistent XLA compile cache under pytest: writing a cache entry
# calls PJRT executable.serialize(), which segfaults the CPU backend
# after ~30 large in-process compilations (observed in long fuzz
# campaigns; crash stack ends in jax compilation_cache
# put_executable_and_time).  The cache only helps cross-process TPU
# startup; in-process jit caching is unaffected.
os.environ.setdefault("GARLIC_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

ORACLE = "/root/reference/bin/linux/garlic"


@pytest.fixture(scope="session")
def oracle_bin():
    if not os.path.exists(ORACLE) or not os.access(ORACLE, os.X_OK):
        pytest.skip("reference oracle binary unavailable")
    return ORACLE
