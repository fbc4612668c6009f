"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is tested on host-count-faked CPU devices (the standard
JAX idiom for testing multi-device code without a pod); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
