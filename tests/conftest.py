"""Test harness: force an 8-device CPU platform before jax initialises.

This is the TPU-native analogue of the reference's "multi-node without a
cluster" gap (SURVEY.md §4): all sharding/collective tests run on an emulated
8-device host mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's real-TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (initialise with the flags above)

# The environment's TPU plugin (sitecustomize) force-sets jax_platforms at
# interpreter start; override it back to CPU before any backend initialises.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 emulated devices, got {len(devs)}"
    return devs[:8]
