"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``xla_force_host_platform_device_count`` (the standard JAX recipe for
simulating a mesh without hardware).

NOTE: in this environment the 'axon' TPU platform plugin overrides the
``JAX_PLATFORMS`` env var, so we must force CPU through
``jax.config.update`` — the env var alone still lands on the (single,
shared, tunnel-attached) TPU chip and serializes the whole suite on it.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (excluded with -m 'not slow')")
