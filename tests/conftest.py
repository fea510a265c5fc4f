"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The env var alone is not honored in images where the axon TPU plugin
# pre-registers itself; force the platform list explicitly.
jax.config.update("jax_platforms", "cpu")
