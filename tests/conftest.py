"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run on any machine (no TPU required). Multi-chip sharding tests use
the 8 virtual CPU devices (`--xla_force_host_platform_device_count=8`), which
exercises the same `jax.sharding.Mesh` / `shard_map` code paths as a real pod
slice.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
