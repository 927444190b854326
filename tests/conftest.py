"""Test harness setup: force the CPU backend with 8 virtual devices.

The ambient environment registers the axon TPU backend at interpreter start
and overrides jax_platforms; tests override it back here, before any backend
is initialized, so the suite runs hermetically on CPU and multi-device tests
get an 8-device mesh via --xla_force_host_platform_device_count.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
