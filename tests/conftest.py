"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding is validated on host CPU via XLA's device-count override.

Note: this environment's axon sitecustomize force-sets
jax.config.jax_platforms='axon,cpu' at interpreter start (overriding the
JAX_PLATFORMS env var), so we must update the config back to 'cpu' after
importing jax — before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs
