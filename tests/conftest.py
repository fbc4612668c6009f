"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is tested on host-count-faked CPU devices (the standard
JAX idiom for testing multi-device code without a pod); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

# Force (override, not setdefault — the host may preset JAX_PLATFORMS to a
# remote TPU platform, which would silently route every test through the
# device tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: the pipeline tests are compile-bound on
# CPU; caching makes re-runs fast.
import jax  # noqa: E402

# Belt and braces: some PJRT plugin setups ignore the env var, so force the
# platform through the config API too.
jax.config.update("jax_platforms", "cpu")

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".cache", "jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
