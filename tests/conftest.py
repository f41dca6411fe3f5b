"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") +
     " --xla_force_host_platform_device_count=8").strip(),
)

import pytest  # noqa: E402

ORACLE = "/root/reference/bin/linux/garlic"


@pytest.fixture(scope="session")
def oracle_bin():
    if not os.path.exists(ORACLE) or not os.access(ORACLE, os.X_OK):
        pytest.skip("reference oracle binary unavailable")
    return ORACLE
