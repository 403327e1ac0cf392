"""Repo-root pytest config: applies to tests/ AND --doctest-modules runs
over bionumpy_tpu/.  Forces JAX onto a virtual 8-device CPU mesh (the axon
sitecustomize force-sets jax_platforms="axon,cpu", which beats env vars)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

collect_ignore = ["bench.py", "__graft_entry__.py"]
