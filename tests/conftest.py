"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the `axon` TPU backend at interpreter
startup and forces jax_platforms via jax.config — so we override both the config
and XLA_FLAGS here, before any backend client is actually instantiated (clients
are created lazily at first use, which is after conftest import). Multi-chip
shardings are validated on the CPU mesh; the driver separately dry-runs the
multichip path via __graft_entry__.py, and bench.py runs on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
