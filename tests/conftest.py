"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests run against
XLA's host-platform device partitioning.
"""

import os

# force CPU (the harness presets JAX_PLATFORMS=axon -> the real TPU chip;
# the axon site hook overrides the env var, so jax.config must be used)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# tests import cli modules; don't let them populate the user's on-disk
# XLA executable cache (tests that WANT the cache set their own dir)
os.environ.setdefault("KDT_COMPILE_CACHE", "off")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
