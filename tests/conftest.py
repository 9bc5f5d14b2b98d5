"""Test configuration: all tests run on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (the bench path runs on the real
chip outside pytest)."""

import os

# hard-assign: the host environment pins JAX_PLATFORMS to the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_config():
    from raytpu.core.types import RenderConfig

    return RenderConfig(width=64, height=48)
