"""Test environment: force an 8-device virtual CPU platform BEFORE jax import
so multi-chip sharding paths are exercised without TPU hardware (the JAX
analogue of the reference's gloo CPU runs, SURVEY.md §4)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the axon TPU plugin and sets
# JAX_PLATFORMS=axon; the env var alone does not win, so pin the platform via
# the config API (must happen before any backend is touched).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
