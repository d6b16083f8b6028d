"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run on any machine (no TPU required). Multi-chip sharding tests use
the 8 virtual CPU devices (`--xla_force_host_platform_device_count=8`), which
exercises the same `jax.sharding.Mesh` / `shard_map` code paths as a real pod
slice.

NOTE: this environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (a tunneled TPU), so env vars set here are too late —
the platform must be overridden through jax.config before the first backend
initialization (jax.devices() etc.).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — backend was "
    "initialized before conftest could configure it"
)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_fused_schedule_cache():
    """Fused-schedule hygiene: background-compiled whole-frame programs
    (render/compaction._FusedAdapter) must neither leak across tests nor
    engage nondeterministically mid-test — a fused frame is allclose, not
    bitwise equal, to the per-dispatch frame, so a compile finishing at a
    race-dependent moment would flake exact-equality assertions. Tests opt
    in explicitly by monkeypatching compaction.FUSED_AUTOCOMPILE = True."""
    from instantvnr_tpu.render import compaction as comp

    prev = comp.FUSED_AUTOCOMPILE
    comp.FUSED_AUTOCOMPILE = False
    try:
        yield
    finally:
        comp.wait_fused_compiles()
        comp._FUSED_EXE.clear()
        comp.FUSED_AUTOCOMPILE = prev
