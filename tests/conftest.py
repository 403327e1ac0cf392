"""Test harness config: run JAX on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import pathlib

import pytest

# the axon sitecustomize force-sets jax_platforms="axon,cpu" via config,
# which beats the env var — override it back to the virtual CPU mesh
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

EXAMPLE_DATA = pathlib.Path("/root/reference/example_data")


@pytest.fixture(scope="session")
def example_data():
    return EXAMPLE_DATA
